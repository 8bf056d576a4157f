"""Random 3D augmentation wrapper with a transformer-budget safety rescale.

Semantics parity with shapeformer/data/paper_datasets/transform_dataset.py:
  - re-center and fit the cloud to [-0.6, 0.6] (transform_dataset.py:47-52);
  - optional random rotation / y-axis rotation / scale / shift;
  - if the 16^3 voxelization exceeds max_voxels (the sparse-token budget,
    = block_size // 2 - padding), shrink by (max_voxels / count)^(2/3)
    (transform_dataset.py:68-77) so sequences fit the transformer block.
"""
from __future__ import annotations

import numpy as np
from scipy.spatial.transform import Rotation as R

from ... import config as _config
from ...utils import nputil
from ..loader import Dataset


def apply_random_scaling(points, max_bound=0.99, rng=None):
    rng = rng or np.random.default_rng()
    extent = np.abs(points).max()
    max_ratio = max_bound / extent
    scaling = 1 + rng.random() * (max_ratio - 1)
    return points * scaling, scaling


def apply_random_shift(points, max_bound=0.99, rng=None):
    rng = rng or np.random.default_rng()
    hbd, lbd = points.max(axis=0), points.min(axis=0)
    hshift, lshift = 1 - hbd, -1 - lbd
    shift = rng.random((1, points.shape[-1])) * (hshift - lshift) + lshift
    return points + shift, shift


def apply_random_transforms(X, Ys, mode=(), max_voxels=812, voxel_dim=16,
                            rng=None):
    rng = rng or np.random.default_rng()
    hbd, lbd = X.max(axis=0), X.min(axis=0)
    center, leng = (hbd + lbd) / 2, (hbd - lbd).max()
    Xb = (X - center) / leng * 0.6
    for key in Ys:
        Ys[key] = (Ys[key] - center) / leng * 0.6
    if "rot_axis_y" in mode:
        r = R.from_rotvec(rng.random() * 2 * np.pi * np.array([0, 1, 0]))
        Xb = r.apply(Xb)
        Ys = {k: r.apply(v) for k, v in Ys.items()}
    if "rot" in mode:
        r = R.random(rng=rng)
        Xb = r.apply(Xb)
        Ys = {k: r.apply(v) for k, v in Ys.items()}
    if "scale" in mode:
        Xb, scaling = apply_random_scaling(Xb, rng=rng)
        Ys = {k: v * scaling for k, v in Ys.items()}
    voxelN = nputil.point2voxel(Xb[None], grid_dim=voxel_dim).sum()
    if voxelN > max_voxels:
        safe = (max_voxels / voxelN) ** (2 / 3.0)
        Xb = Xb * safe
        Ys = {k: v * safe for k, v in Ys.items()}
    if "shift" in mode:
        Xb, shift = apply_random_shift(Xb, rng=rng)
        Ys = {k: v + shift for k, v in Ys.items()}
    return Ys


class TransformDataset(Dataset):
    def __init__(self, split="test", mode=("rot_axis_y", "scale"),
                 apply_Xtg=False, max_voxels=100, voxel_dim=16, dset_opt=None,
                 seed=314):
        self.mode, self.apply_Xtg = mode, apply_Xtg
        self.max_voxels, self.voxel_dim = max_voxels, voxel_dim
        dset_opt = dict(dset_opt or {})
        dset_opt.setdefault("kwargs", {}).setdefault("split", split)
        self.dset = _config.instantiate_from_opt(dset_opt)
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.dset)

    def __getitem__(self, ind):
        ditem = self.dset[ind]
        if "Xbd" in ditem:
            nditem = {"Xbd": ditem["Xbd"].copy()}
            if "Xct" in ditem:
                nditem["Xct"] = ditem["Xct"].copy()
            if "Xtg" in ditem and self.apply_Xtg:
                nditem["Xtg"] = ditem["Xtg"].copy()
            ret = apply_random_transforms(
                ditem["Xbd"].copy(), nditem, mode=self.mode,
                max_voxels=self.max_voxels, voxel_dim=self.voxel_dim,
                rng=self.rng)
            for key in ret:
                ditem[key] = ret[key].astype(np.float32)
        return ditem
