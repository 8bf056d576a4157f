"""D-FAUST human-shape SDF datasets over per-frame obj + npy sample files.

Semantics parity with shapeformer/data/dfaust_datasets/:
  DFAUSTDataset      dfaust_dataset.py:14-83  (v0: per-frame dict npy with
                     Xbd + dense SDF grid Ytg; occupancy label = sdf < 0)
  DFAUSTV1Dataset    dfaustv1_dataset.py:14-78 (v1: separate Xbd/Xtg/Ytg
                     sampled-probe npys from the datagen pipeline)
  DFAUSTPointsDataset dfaust_points_dataset.py:14-70 (points only: Xbd/Xct)
Directory layout: <dataset_path>/<sequence>/<frame>.obj plus the generated
sample files next to each obj; sequence lists in datasets/DFAUST/{train,val}.lst.
"""
from __future__ import annotations

import glob
import os

import numpy as np

from ... import config as _config
from ...utils import nputil
from ..loader import Dataset

_DEFAULT_PARTIAL = {"class": "shapeformer.data.partial.BallSelector",
                    "kwargs": dict(radius=0.4, context_N=512)}


from ...callbacks import base as _base_cb
from ...utils import geoutil, nputil, visutil

class _DFAUSTBase(Dataset):
    def __init__(self, dataset_path="datasets/DFAUST/data/", data_list=None,
                 split="train", boundary_N=2048, target_N=8192, version=0,
                 resolution=64, apply_random_shift=False, partial_opt=None,
                 seed=314):
        self.dataset_path = dataset_path
        self.split = split
        self.boundary_N, self.target_N = boundary_N, target_N
        self.version, self.resolution = version, resolution
        self.apply_random_shift = apply_random_shift
        self.rng = np.random.default_rng(seed)
        if data_list is None:
            lst = ("datasets/DFAUST/train.lst" if split == "train"
                   else "datasets/DFAUST/val.lst")
            data_list = np.atleast_1d(np.loadtxt(lst, dtype=str))
        self.data_list = data_list
        self.all_objs = []
        for name in self.data_list:
            self.all_objs.extend(
                sorted(glob.glob(os.path.join(dataset_path, str(name),
                                              "*.obj"))))
        self.length = len(self.all_objs)
        self.partial_selector = _config.instantiate_from_opt(
            partial_opt or _DEFAULT_PARTIAL)
        self.Xtg = nputil.makeGrid([-1, -1, -1.0], [1.0, 1, 1],
                                   [resolution] * 3,
                                   indexing="ij").astype(np.float32)

    def __len__(self):
        return self.length

    def _shift(self, Xbd):
        if self.apply_random_shift:
            Xbd = Xbd - (self.rng.random(3) * 0.1 - 0.05)[None]
        return Xbd

    def _partial_and_boundary(self, Xbd):
        Xct = np.float32(self.partial_selector(Xbd, rng=self.rng))
        choice = self.rng.integers(0, Xbd.shape[0], self.boundary_N)
        return Xct, Xbd[choice].astype(np.float32)


class DFAUSTDataset(_DFAUSTBase):
    """v0 layout: <frame>_v{V}_res{R}.npy dict npy holding Xbd + dense SDF
    grid Ytg; occupancy label = (sdf < 0)."""

    def __getitem__(self, index):
        obj = self.all_objs[index % self.length]
        suffix = f"_v{self.version}_res{self.resolution}.npy"
        data = np.load(os.path.splitext(obj)[0] + suffix,
                       allow_pickle=True).item()
        Xbd = self._shift(np.asarray(data["Xbd"], np.float32))
        Xct, Xbd = self._partial_and_boundary(Xbd)
        Ytg = np.asarray(data["Ytg"], np.float32).reshape(-1, 1)
        Ytg = (Ytg < 0).astype(np.float32)  # negative-inside sdf -> occupancy
        Xtg = self.Xtg
        if self.target_N != -1:
            choice = self.rng.integers(0, Xtg.shape[0], self.target_N)
            Xtg, Ytg = Xtg[choice], Ytg[choice]
        return dict(Xct=Xct, Xbd=Xbd, Xtg=Xtg.astype(np.float32), Ytg=Ytg)


class DFAUSTV1Dataset(_DFAUSTBase):
    """v1 layout: <frame>_v1_{Xbd,Xtg,Ytg}.npy sampled-SDF probes
    (dfaustv1_dataset.py)."""

    def __init__(self, version=1, **kw):
        super().__init__(version=version, **kw)

    def __getitem__(self, index):
        obj = self.all_objs[index % self.length]
        stem = os.path.splitext(obj)[0] + f"_v{self.version}"
        Xbd = self._shift(np.load(stem + "_Xbd.npy").astype(np.float32))
        Xct, Xbd = self._partial_and_boundary(Xbd)
        Xtg = np.load(stem + "_Xtg.npy").astype(np.float32)
        Ytg = np.load(stem + "_Ytg.npy").astype(np.float32).reshape(-1, 1)
        Ytg = (Ytg < 0).astype(np.float32)
        if self.target_N != -1:
            choice = self.rng.integers(0, Xtg.shape[0], self.target_N)
            Xtg, Ytg = Xtg[choice], Ytg[choice]
        return dict(Xct=Xct, Xbd=Xbd, Xtg=Xtg, Ytg=Ytg)


class DFAUSTPointsDataset(_DFAUSTBase):
    """Points-only variant (Xbd/Xct, no targets) for transformer training
    (dfaust_points_dataset.py)."""

    def __getitem__(self, index):
        obj = self.all_objs[index % self.length]
        suffix = f"_v{self.version}_res{self.resolution}.npy"
        path = os.path.splitext(obj)[0] + suffix
        if os.path.exists(path):
            Xbd = np.asarray(np.load(path, allow_pickle=True).item()["Xbd"],
                             np.float32)
        else:
            Xbd = np.load(os.path.splitext(obj)[0]
                          + f"_v{self.version}_Xbd.npy").astype(np.float32)
        Xbd = self._shift(Xbd)
        Xct, Xbd = self._partial_and_boundary(Xbd)
        return dict(Xct=Xct, Xbd=Xbd)


class VisDFAUSTDataset_points(_base_cb.VisCallback):
    """Dataset inspection callback (reference dfaust_dataset.py:86-110 /
    dfaustv1_dataset.py:80): renders the GT occupancy recon (if targets are
    present) and the boundary cloud of each visual item — pure observability,
    no model involved."""

    def __init__(self, render_samples=64, resolution=(256, 256), **kwargs):
        self.resolution = tuple(resolution)
        self.render_samples = render_samples
        super().__init__(**kwargs)
        self.all_Xtg = nputil.makeGrid([-1, -1, -1.0], [1.0, 1, 1],
                                       [128] * 3, indexing="ij")

    def compute_batch(self, batch, input_name=""):
        return {"batch": batch}

    def visualize_batch(self, computed, input_name=""):
        batch = computed["batch"]
        imgs = {}
        if "Ytg" in batch and "Xtg" in batch:
            occ = np.asarray(batch["Ytg"][0]).reshape(-1)
            xtg = np.asarray(batch["Xtg"][0])
            n = round(occ.shape[0] ** (1 / 3))
            if n ** 3 == occ.shape[0]:  # full-grid targets -> meshable
                vert, face = geoutil.array2mesh(occ, thresh=0.5, coords=xtg)
                imgs["gt"] = visutil.render_mesh(vert, face,
                                                 resolution=self.resolution)
            else:                        # sparse targets -> occupied points
                imgs["gt"] = visutil.render_cloud(xtg[occ > 0.5],
                                                  resolution=self.resolution)
        if "Xbd" in batch:
            imgs["gt_pc"] = visutil.render_cloud(np.asarray(batch["Xbd"][0]),
                                                 resolution=self.resolution)
        return imgs
