"""Real-scan / fixed-view evaluation datasets (the paper's real-world eval).

Capability parity with the reference's test-only dataset zoo under
shapeformer/data/imnet_datasets/:
  HPRScan_dataset / OrthoHPRScan_dataset / HPRScanHD_dataset
      hprscan_dataset.py:15-88 — 8 ShapeNet categories x samples_per_cate,
      deterministic per-item seeding, virtual-scan partial views;
  AMScan_dataset
      hprscan_dataset.py:103-194 — ambiguity-ranked camera views from
      precomputed viewranks files over a fibonacci sphere;
  Redwood / Redwood2 / RealTest_dataset / RealTest2_dataset
      redwood.py:17-104, realtest.py:17-111 — raw .pts scans (Redwood-style),
      two normalization conventions, virtual-scan context synthesis;
  Richcar_dataset
      rd.py:16-158, real_richcar.py:16 — one named scan viewed from fixed
      camera poses through CamVirtualScanSelector.

Rebuild notes (not a port): the reference files import a stale
`shapeformer.data.ar_datasets.*` path (dead code without fixup — SURVEY.md
section 2.1 row 13) and hardcode `/studio/liqiang/redwood`; here the scan
directory is a kwarg (`scan_path`, default `datasets/redwood`), randomness is
explicit per-item `np.random.default_rng((evalseed + ind) % 123456)` instead
of global temp_seed, and the category table lives in one place.
"""
from __future__ import annotations

import glob
import os

import h5py
import numpy as np

from ... import config as _config
from ...utils import geoutil
from .imnet_datasets import Imnet2Dataset, Imnet2LowResDataset

# 0 plane, 1 bench, 2 cabinet, 3 car, 4 chair, 5 tv, 6 lamp, 7 cab, 8 gun,
# 9 sofa, 10 table, 11 ?, 12 vessel (hprscan_dataset.py:24-26)
EVAL_CATES = (0, 1, 3, 4, 6, 9, 10, 12)


def select_eval_shapeids(h5path, cate_list=EVAL_CATES, samples_per_cate=100,
                         evalseed=314, random_choice=True):
    """Deterministic per-category shape choice, interleaved across categories
    (hprscan_dataset.py:27-37: choices.transpose(1,0).reshape(-1))."""
    rng = np.random.default_rng(evalseed)
    choices = np.zeros((len(cate_list), samples_per_cate), np.int64)
    with h5py.File(h5path, "r") as f:
        for i, cate in enumerate(cate_list):
            cand = np.array(f[f"cate_{cate}"])
            if random_choice:
                choices[i] = cand[rng.integers(0, cand.shape[0],
                                               samples_per_cate)]
            else:
                idx = np.minimum(np.arange(samples_per_cate), cand.shape[0] - 1)
                choices[i] = cand[idx]
    return choices.transpose(1, 0).reshape(-1)


class _EvalSeeded:
    """Mixin: item ind -> deterministic rng + underlying shape id."""

    def _item_rng(self, ind):
        return np.random.default_rng((self.evalseed + ind) % 123456)


class HPRScan_dataset(Imnet2LowResDataset, _EvalSeeded):
    """Virtual-scan eval over 8 categories (hprscan_dataset.py:15-50)."""

    SELECTOR = "shapeformer.data.partial.VirtualScanSelector"

    def __init__(self, split="test", samples_per_cate=100, context_N=8192,
                 camR=10, evalseed=314, cate_list=EVAL_CATES, **kwargs):
        assert split != "train", "this dataset only aims for test"
        kwargs["partial_opt"] = {
            "class": self.SELECTOR,
            "kwargs": dict(radius=camR, context_N=context_N)}
        super().__init__(split=split, **kwargs)
        self.evalseed = evalseed
        self.shapeids = select_eval_shapeids(
            self.dpath, cate_list, samples_per_cate, evalseed)

    def __len__(self):
        return len(self.shapeids)

    def convert_index(self, index):
        return int(self.shapeids[index])

    def __getitem__(self, ind):
        self.rng = self._item_rng(ind)
        return super().__getitem__(self.convert_index(ind))


class OrthoHPRScan_dataset(HPRScan_dataset):
    """Axis-aligned virtual scans (hprscan_dataset.py:53-55)."""
    SELECTOR = "shapeformer.data.partial.OrthoVirtualScanSelector"


class HPRScanHD_dataset(Imnet2Dataset, _EvalSeeded):
    """Full-res (256^3) variant (hprscan_dataset.py:58-88)."""

    def __init__(self, split="test", samples_per_cate=100, context_N=8192,
                 camR=10, evalseed=314, cate_list=EVAL_CATES, **kwargs):
        assert split != "train", "this dataset only aims for test"
        kwargs["partial_opt"] = {
            "class": "shapeformer.data.partial.VirtualScanSelector",
            "kwargs": dict(radius=camR, context_N=context_N)}
        super().__init__(split=split, **kwargs)
        self.evalseed = evalseed
        self.shapeids = select_eval_shapeids(
            self.dpath, cate_list, samples_per_cate, evalseed)

    def __len__(self):
        return len(self.shapeids)

    def __getitem__(self, ind):
        self.rng = self._item_rng(ind)
        return super().__getitem__(int(self.shapeids[ind]))


# --------------------------------------------------------------- raw scans
def _load_pts(path):
    pts = np.loadtxt(path)
    return np.asarray(pts[:, :3], np.float32)


def _normalize_mean_max(points, scale):
    """Mean-center, divide by max coordinate (redwood.py:53-58)."""
    points = points - points.mean(axis=0)
    return points / points.max() * scale


def _normalize_bbox_absmax(points, scale):
    """Bbox-center, divide by abs max (redwood.py:99-102)."""
    points = points - (points.max(axis=0) + points.min(axis=0)) / 2
    return points / np.abs(points).max() * scale


class _PtsScanBase(_EvalSeeded):
    """Shared .pts-directory plumbing for the Redwood/RealTest variants."""

    NORMALIZE = staticmethod(_normalize_mean_max)
    SCALE = 0.7

    def __init__(self, scan_path="datasets/redwood", context_N=8192, camR=10,
                 evalseed=314, pattern="*.pts", **kwargs):
        self.evalseed = evalseed
        self.scan_path = scan_path
        self.pts_files = sorted(glob.glob(os.path.join(scan_path, pattern)))
        self.partial_selector = _config.instantiate_from_opt({
            "class": "shapeformer.data.partial.VirtualScanSelector",
            "kwargs": dict(radius=camR, context_N=context_N)})

    def __len__(self):
        return len(self.pts_files)

    def __getitem__(self, ind):
        points = self.NORMALIZE(_load_pts(self.pts_files[ind]), self.SCALE)
        rng = self._item_rng(ind)
        return {"Xbd": points,
                "Xct": np.float32(self.partial_selector(points, rng=rng))}


class Redwood(_PtsScanBase):
    """Redwood scans, mean/max normalization x0.7 (redwood.py:17-60)."""
    NORMALIZE = staticmethod(_normalize_mean_max)
    SCALE = 0.7


class Redwood2(_PtsScanBase):
    """Redwood scans, bbox/absmax normalization x0.9 (redwood.py:63-104)."""
    NORMALIZE = staticmethod(_normalize_bbox_absmax)
    SCALE = 0.9


class RealTest_dataset(_PtsScanBase):
    """realtest.py:17-64 (mean/max x0.8)."""
    NORMALIZE = staticmethod(_normalize_mean_max)
    SCALE = 0.8


class RealTest2_dataset(_PtsScanBase):
    """realtest.py:67-111 (bbox/absmax x0.85)."""
    NORMALIZE = staticmethod(_normalize_bbox_absmax)
    SCALE = 0.85


class Richcar_dataset(_EvalSeeded):
    """One named scan viewed from fixed cameras (rd.py:16-158; the
    real_richcar.py variant differs only in shape_ind/scan dir defaults)."""

    def __init__(self, scan_path="datasets/redwood", shape_ind="06145",
                 context_N=8192, camR=10, evalseed=314,
                 camera_poses=((0.5, 0.5, -1.8),), **kwargs):
        self.evalseed = evalseed
        files = sorted(glob.glob(os.path.join(scan_path, f"{shape_ind}.pts")))
        assert files, f"no scan {shape_ind}.pts under {scan_path}"
        self.points = _normalize_bbox_absmax(_load_pts(files[0]), 0.85)
        self.camera_poses = [np.asarray(c, np.float32) for c in camera_poses]
        self.partial_selector = _config.instantiate_from_opt({
            "class": "shapeformer.data.partial.CamVirtualScanSelector",
            "kwargs": dict(radius=camR, context_N=context_N)})

    def __len__(self):
        return len(self.camera_poses)

    def __getitem__(self, ind):
        Xct = self.partial_selector(self.points,
                                    camera_pos=self.camera_poses[ind],
                                    rng=self._item_rng(ind))
        return {"Xbd": self.points, "Xct": np.float32(Xct)}


class AMScan_dataset(_EvalSeeded):
    """Ambiguity-ranked virtual scans (hprscan_dataset.py:103-194): each shape
    is scanned from a camera drawn from an `am_range` percentile window of its
    precomputed view ranking (datasets/<name>/viewranks/<split>/<id>.txt) over
    a 64-point fibonacci sphere + the 6 ortho views."""

    def __init__(self, split="test", cate_list="all", class_label=False,
                 gen_xct=True, dpath="datasets/IMNet2_64", am_range=(0.9, 1.0),
                 samples_per_cate=100, context_N=16384, boundary_N=32768,
                 evalseed=314, random_choice=False, fixed_camPos=None,
                 random_views=False, Xbd_as_Xct=False, Ytg=False, **kwargs):
        self.__dict__.update(
            split=split, class_label=class_label, gen_xct=gen_xct,
            dpath=dpath, am_range=tuple(am_range), context_N=context_N,
            boundary_N=boundary_N, evalseed=evalseed,
            fixed_camPos=fixed_camPos,
            random_views=random_views or split == "train",
            Xbd_as_Xct=Xbd_as_Xct, want_Ytg=Ytg)
        self.h5path = os.path.join(dpath, f"{split}.hdf5")
        if isinstance(cate_list, str) and cate_list == "all":
            cate_list = tuple(range(13))
        if samples_per_cate == -1:
            cates, labels = [], []
            with h5py.File(self.h5path, "r") as f:
                for i, cate in enumerate(cate_list):
                    cates.append(np.array(f[f"cate_{cate}"]))
                    labels.append(np.full(cates[-1].shape[0], i))
            self.shapeids = np.concatenate(cates)
            self.labels = np.concatenate(labels)
        else:
            self.shapeids = select_eval_shapeids(
                self.h5path, cate_list, samples_per_cate, evalseed,
                random_choice=random_choice)
            self.labels = np.repeat(np.arange(len(cate_list)),
                                    samples_per_cate)
        views = geoutil.fibonacci_sphere(samples=64)
        ortho = np.array([[1., 0, 0], [-1, 0, 0], [0, 1., 0],
                          [0, -1, 0], [0, 0, 1], [0, 0, -1]])
        self.cviews = np.concatenate([views, ortho]) * 10.0

    def __len__(self):
        return len(self.shapeids)

    def _camera(self, shape_i, rng):
        if self.fixed_camPos is not None:
            return np.asarray(self.fixed_camPos, np.float32)
        if self.split == "train":
            vec = rng.normal(size=3)
            return np.float32(vec / np.linalg.norm(vec))
        ranks = np.loadtxt(os.path.join(
            self.dpath, "viewranks", self.split, f"{shape_i}.txt")).astype(int)
        ranks = np.atleast_1d(ranks)
        lb = int(round(ranks.shape[0] * self.am_range[0]))
        ub = max(int(round(ranks.shape[0] * self.am_range[1])), lb + 1)
        view = rng.integers(lb, ub)
        return self.cviews[ranks[min(view, ranks.shape[0] - 1)]]

    def __getitem__(self, ind):
        shape_i = int(self.shapeids[ind])
        seed = self.evalseed + shape_i
        if self.random_views:
            seed = seed + np.random.randint(1000)
        rng = np.random.default_rng(seed % 123456)
        ditem = {}
        with h5py.File(self.h5path, "r") as f:
            Xbd = np.array(f["Xbd"][shape_i], np.float32)
            if self.want_Ytg:
                ditem["Ytg"] = np.unpackbits(np.array(f["Ytg"][shape_i]))
        cam = self._camera(shape_i, rng)
        if self.gen_xct and not self.Xbd_as_Xct:
            Xct = geoutil.hidden_point_removal(Xbd, cam)
        else:
            Xct = Xbd
        Xct = Xct[rng.integers(0, Xct.shape[0], self.context_N)]
        Xbd = Xbd[rng.integers(0, Xbd.shape[0], self.boundary_N)]
        ditem.update(Xct=np.float32(Xct), Xbd=np.float32(Xbd))
        if self.class_label:
            ditem["label"] = int(self.labels[ind])
        return ditem
