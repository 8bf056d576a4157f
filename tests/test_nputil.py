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


def test_unfold_fold_cube_roundtrip(rng):
    vox = rng.integers(0, 2, (2, 8, 8, 8)).astype(np.float32)
    unfolded = npu.unfold_cube(vox, last_dims=3, size=2, step=2)
    assert unfolded.shape == (2, 64, 8)
    back = np.stack([npu.fold_cube(u, N=3) for u in unfolded])
    np.testing.assert_array_equal(back, vox)
    # non-flat layout keeps block axes separable
    blocks = npu.unfold_cube(vox, last_dims=3, size=2, step=2, flatten=False)
    assert blocks.shape == (2, 4, 4, 4, 2, 2, 2)
    np.testing.assert_array_equal(blocks[0, 0, 0, 0], vox[0, :2, :2, :2])


def test_point2tree_octree_codes(rng):
    pts = rng.uniform(-0.9, 0.9, (50, 3))
    depth = 4
    tree = npu.point2tree(pts, depth=depth)
    assert (np.diff(tree) > 0).all()          # sorted unique
    assert tree[0] == 1                       # root node always present
    # every node's parent (3-bit shift) is in the tree
    parents = set(tree.tolist())
    for code in tree:
        if code > 1:
            assert int(code) >> 3 in parents, code
    # leaves live at the requested depth
    leaf_mask = tree >= (1 << (3 * depth))
    assert leaf_mask.sum() >= 1
    centers, boxlen, tdepth = npu.tree2bboxes(tree, dim=3, depth=depth)
    assert (tdepth[leaf_mask] == depth).all()
    assert np.allclose(boxlen[tree == 1], 1.0)  # root half-extent (bbox [-1,1])
    # leaf centers reproduce the occupied cells of the voxelization
    leaf_codes = tree[leaf_mask] - (1 << (3 * depth))
    want = np.unique(npu.point2index(pts, grid_dim=2 ** depth, ravel=True,
                                        ravel_type="zorder"))
    np.testing.assert_array_equal(np.sort(leaf_codes), want)
