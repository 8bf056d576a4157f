"""Unit tests for host-side numpy utilities.

Ports the reference's inline unittest functions as real tests (SURVEY.md
section 4): ravel_unittest / zorder_ravel_unittest (ptutil.py:379,411),
fold_unittest (ptutil.py:315-327), plus grid/point codecs.
"""
import numpy as np
import pytest

from shapeformer_tpu.utils import nputil as npu


def test_ravel_roundtrip_2d_3d():
    for shape in [(3, 3), (3, 3, 3), (4, 5, 6)]:
        n = int(np.prod(shape))
        idx = np.arange(n)
        ref = np.stack(np.unravel_index(idx, shape), axis=-1)
        un = npu.unravel_index(idx, shape)
        assert (un == ref).all()
        assert (npu.ravel_index(un, shape) == idx).all()


def test_zorder_roundtrip():
    idx = np.arange(16)
    mind = npu.unravel_index(idx, (4, 4))
    code = npu.ravel_index_zorder(mind, depth=2)
    assert sorted(code.tolist()) == list(range(16))
    back = npu.unravel_index_zorder(code, dim=2, depth=2)
    assert (back == mind).all()
    # 3D
    mind3 = npu.unravel_index(np.arange(64), (4, 4, 4))
    code3 = npu.ravel_index_zorder(mind3, depth=2)
    assert sorted(code3.tolist()) == list(range(64))
    assert (npu.unravel_index_zorder(code3, dim=3, depth=2) == mind3).all()


def test_zorder_locality():
    # Morton codes of the 2x2x2 sub-block at origin must be 0..7
    cells = npu.unravel_index(np.arange(8), (2, 2, 2))
    code = npu.ravel_index_zorder(cells, depth=4)
    assert sorted(code.tolist()) == list(range(8))


def test_point_index_roundtrip():
    gd = 64
    idx = np.arange(gd)
    pts = npu.index2point(idx, grid_dim=gd)
    assert (npu.point2index(pts[:, None], grid_dim=gd)[:, 0] == idx).all()
    assert pts.min() > -1 and pts.max() < 1


def test_point2index_clamps():
    pts = np.array([[-1.0, 1.0, 0.999], [1.5, -1.5, 0.0]])
    idx = npu.point2index(pts, grid_dim=16)
    assert idx.min() >= 0 and idx.max() <= 15


def test_makeGrid_on_in():
    g = npu.makeGrid([-1, -1, -1], [1, 1, 1], [4, 4, 4], mode="on")
    assert g.shape == (64, 3)
    assert g[0].tolist() == [-1, -1, -1] and g[-1].tolist() == [1, 1, 1]
    gi = npu.makeGrid([-1, -1], [1, 1], [4, 4], mode="in")
    assert np.isclose(gi[0, 0], -1 + 2 / 8)
    # 'ij' indexing: first axis varies slowest
    assert np.allclose(g[:16, 0], -1)


def test_compress_decompress_voxels(rng):
    vox = rng.random((64, 64, 64)) > 0.7
    vocab, idx = npu.compress_voxels(vox, block=16)
    out = npu.decompress_voxels(vocab, idx)
    assert (out.astype(bool) == vox).all()
    # structured grid compresses heavily
    vox2 = np.zeros((64, 64, 64), bool)
    vox2[:32] = True
    vocab2, idx2 = npu.compress_voxels(vox2, block=16)
    assert vocab2.shape[0] == 2  # only empty + full tiles
    assert (npu.decompress_voxels(vocab2, idx2).astype(bool) == vox2).all()


def test_point2voxel():
    pts = np.array([[[-0.99, -0.99, -0.99], [0.99, 0.99, 0.99]]])
    vox = npu.point2voxel(pts, grid_dim=4)
    assert vox.shape == (1, 4, 4, 4)
    assert vox[0, 0, 0, 0] == 1 and vox[0, 3, 3, 3] == 1
    assert vox.sum() == 2


def test_sigmoid_logsoftmax():
    x = np.array([-500.0, 0.0, 500.0])
    s = npu.sigmoid(x)
    assert np.isfinite(s).all() and s[1] == pytest.approx(0.5)
    ls = npu.logsoftmax(np.array([[1.0, 2.0, 3.0]]))
    assert np.isclose(np.exp(ls).sum(), 1.0)
