"""Synthetic procedural shape data in the exact IMNet2 hdf5 layout.

The reference trains on preprocessed ShapeNet (IMNet2_64/IMNet2_packed hdf5,
imnet_datasets.py:306-369, not redistributable and not present in this image).
This module generates analytic shape families (superellipsoid unions) with
identical storage layout — `Xbd` ragged surface clouds, `Ytg` bit-packed 64^3
occupancy, `cate_i` index sets, `shape_vocab`/`vocab_idx` block-compressed
256^3 voxels — so the full data pipeline, training and demo paths run
end-to-end and transfer unchanged to the real datasets.
"""
from __future__ import annotations

import os

import numpy as np

from ..utils import geoutil
from ..utils.h5store import to_object_array, writeh5
from ..utils.nputil import compress_voxels, makeGrid


def superellipsoid_occupancy(coords, center, radii, power, rot=None):
    """Inside-test of |x/a|^p + |y/b|^p + |z/c|^p <= 1 at given coords."""
    p = coords - center
    if rot is not None:
        p = p @ rot.T
    t = np.abs(p / radii) ** power
    return t.sum(axis=-1) <= 1.0


def random_shape_occupancy(coords, rng, n_parts=None):
    """Union of 1-3 random superellipsoids: a crude 'furniture-like' family."""
    n_parts = n_parts or rng.integers(1, 4)
    occ = np.zeros(coords.shape[0], bool)
    for _ in range(n_parts):
        center = rng.uniform(-0.35, 0.35, 3)
        radii = rng.uniform(0.15, 0.55, 3)
        power = rng.choice([2.0, 4.0, 8.0])
        theta = rng.uniform(0, 2 * np.pi)
        c, s = np.cos(theta), np.sin(theta)
        rot = np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]])
        occ |= superellipsoid_occupancy(coords, center, radii, power, rot)
    return occ


def occupancy_to_cloud(occ_grid, n_points, rng):
    """Mesh the occupancy and area-sample a surface cloud."""
    vert, face = geoutil.array2mesh(
        occ_grid.reshape(-1).astype(np.float32), thresh=0.5)
    if len(face) == 0:
        return rng.uniform(-0.5, 0.5, (n_points, 3)).astype(np.float32)
    return geoutil.sampleMesh(vert, face, n_points, rng=rng)


def make_synthetic_imnet(out_dir, n_train=16, n_test=4, grid_dim=64,
                         cloud_N=16384, n_cates=2, seed=314, full_res=False):
    """Write datasets/<name>/{train,test}.hdf5 in Imnet2LowResDataset layout
    (plus Imnet2Dataset's vocab fields when full_res)."""
    coords = makeGrid([-1, -1, -1.0], [1.0, 1, 1], [grid_dim] * 3, indexing="ij")
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    for split, n in [("train", n_train), ("test", n_test)]:
        clouds, ytgs, vocabs, vidxs = [], [], [], []
        for _ in range(n):
            occ = random_shape_occupancy(coords, rng)
            grid = occ.reshape(grid_dim, grid_dim, grid_dim)
            clouds.append(occupancy_to_cloud(grid, cloud_N, rng))
            ytgs.append(np.packbits(occ.astype(np.uint8)))
            if full_res:
                vocab, vidx = compress_voxels(grid, block=grid_dim // 4)
                vocabs.append(vocab)
                vidxs.append(vidx)
        data = {
            "Xbd": to_object_array(clouds),
            "Ytg": to_object_array(ytgs),
        }
        if full_res:
            data["shape_vocab"] = to_object_array(vocabs)
            data["vocab_idx"] = to_object_array(vidxs)
        for c in range(n_cates):
            data[f"cate_{c}"] = np.arange(c, n, n_cates)
        writeh5(os.path.join(out_dir, f"{split}.hdf5"), data)
    return out_dir


def make_demo_dataset(out_dir, names=("box", "sphere", "lshape"),
                      boundary_N=32768, context_N=16384, seed=314):
    """Write demo/dataset/<name>/{Xbd,Xct}.npy + demo.lst in the reference's
    demo layout (data/paper_datasets/list_dataset.py:13-37)."""
    from .partial import VirtualScanSelector
    rng = np.random.default_rng(seed)
    coords = makeGrid([-1, -1, -1.0], [1.0, 1, 1], [96] * 3, indexing="ij")
    os.makedirs(out_dir, exist_ok=True)
    selector = VirtualScanSelector(context_N=context_N)
    for name in names:
        occ = random_shape_occupancy(coords, rng)
        cloud = occupancy_to_cloud(occ.reshape(96, 96, 96), boundary_N, rng)
        Xct = selector(cloud, rng=rng).astype(np.float32)
        shape_dir = os.path.join(out_dir, name)
        os.makedirs(shape_dir, exist_ok=True)
        np.save(os.path.join(shape_dir, "Xbd.npy"), cloud)
        np.save(os.path.join(shape_dir, "Xct.npy"), Xct)
    with open(os.path.join(out_dir, "demo.lst"), "w") as f:
        f.write("\n".join(names) + "\n")
    return out_dir
