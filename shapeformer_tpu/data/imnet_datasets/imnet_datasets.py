"""IMNet/ShapeNet occupancy datasets (hdf5-backed, ragged store).

Semantics parity with shapeformer/data/imnet_datasets/imnet_datasets.py:
  Imnet2LowResDataset (13-303): bit-packed 64^3 occupancy targets, partial
  cloud synthesis, boundary resampling, category subsets, balanced sampling;
  Imnet2Dataset (13-141): block-compressed 256^3 voxels with random target
  probing.  Datasets resolve `datasets/<name>/<split>.hdf5` relative to CWD
  exactly like the reference (imnet_datasets.py:20).
"""
from __future__ import annotations

import os

import h5py
import numpy as np

from ... import config as _config
from ...utils import nputil
from ...utils.h5store import H5Var
from ..loader import Dataset

_DEFAULT_PARTIAL = {"class": "shapeformer.data.partial.BallSelector",
                    "kwargs": dict(radius=0.4, context_N=512)}


class _ImnetBase(Dataset):
    def __init__(self, dataset, cate="all", duplicate_size=1, split="train",
                 boundary_N=2048, target_N=-1, grid_dim=64,
                 weighted_sampling=False, Xbd_as_Xct=False, Xct_as_Xbd=False,
                 partial_opt=None, zoomfac=1, seed=314):
        self.split = split
        self.dpath = f"datasets/{dataset}/{split}.hdf5"
        if split == "val" and not os.path.exists(self.dpath):
            # reference setups have no val file; DataModule falls back to test
            self.dpath = f"datasets/{dataset}/test.hdf5"
        self.grid_dim = grid_dim
        self.weighted_sampling = weighted_sampling
        self.boundary_N, self.target_N = boundary_N, target_N
        self.Xbd_as_Xct, self.Xct_as_Xbd = Xbd_as_Xct, Xct_as_Xbd
        self.duplicate_size = duplicate_size if split == "train" else 1
        self.rng = np.random.default_rng(seed)
        with h5py.File(self.dpath, "r") as f:
            total = (f["Xbd_serial_dataBias"].shape[0] - 1
                     if "Xbd_serial_dataBias" in f else f["Xbd"].shape[0])
            if isinstance(cate, str):
                self.subset = (np.arange(total) if cate == "all"
                               else np.array(f[f"cate_{cate}"]))
            else:
                self.subset = np.concatenate(
                    [np.array(f[f"cate_{c}"]) for c in cate])
        self.length = len(self.subset)
        self.partial_selector = _config.instantiate_from_opt(
            partial_opt or _DEFAULT_PARTIAL)
        self.Xbds = H5Var(self.dpath, "Xbd")
        self.all_Xtg = nputil.makeGrid(
            [-1, -1, -1.0], [1.0, 1, 1], [grid_dim] * 3, indexing="ij"
        ).astype(np.float32)

    def __len__(self):
        return self.length * self.duplicate_size

    def get_partial(self, Xbd, index=None):
        if self.Xbd_as_Xct:
            return Xbd
        return self.partial_selector(Xbd, index=index, rng=self.rng)


class Imnet2LowResDataset(_ImnetBase):
    """Main training set: 64^3 bit-packed occupancy (imnet_datasets.py:144-303)."""

    def __init__(self, dataset="IMNet2_64", **kw):
        super().__init__(dataset=dataset, **kw)
        self.Ytgs = H5Var(self.dpath, "Ytg")

    def __getitem__(self, index, all_target=False):
        index = index % self.length
        o_ind = index
        index = int(self.subset[index])
        Xbd = self.Xbds[index]
        Xct = np.float32(self.get_partial(Xbd, index=o_ind))
        Xbd = Xbd[self.rng.integers(0, Xbd.shape[0], self.boundary_N)]
        Ytg = np.unpackbits(self.Ytgs[index].astype(np.uint8),
                            axis=-1)[..., None]
        Xtg = self.all_Xtg
        if self.weighted_sampling:
            target_N = self.target_N if self.target_N != -1 else Xtg.shape[0]
            Xtg, Ytg = balanced_sampling2(
                Xbd, Xtg, Ytg, target_N=target_N, x_dim=Xbd.shape[-1],
                grid_dim=self.grid_dim, rng=self.rng)
        elif self.target_N != -1 and not all_target:
            choice = self.rng.integers(0, Xtg.shape[0], self.target_N)
            Xtg, Ytg = Xtg[choice], Ytg[choice]
        if self.Xct_as_Xbd:
            Xbd = Xct
        return dict(Xct=Xct.astype(np.float32), Xbd=Xbd.astype(np.float32),
                    Xtg=Xtg.astype(np.float32), Ytg=Ytg.astype(np.float32))


class Imnet2Dataset(_ImnetBase):
    """Full-res variant: block-compressed 256^3 voxels
    (imnet_datasets.py:13-141)."""

    def __init__(self, dataset="IMNet2_packed", grid_dim=256, **kw):
        super().__init__(dataset=dataset, grid_dim=grid_dim, **kw)
        self.shape_vocabs = H5Var(self.dpath, "shape_vocab")
        self.vocab_idxs = H5Var(self.dpath, "vocab_idx")

    def __getitem__(self, index, all_target=False):
        index = index % self.length
        o_ind = index
        index = int(self.subset[index])
        Xbd = self.Xbds[index]
        Xct = np.float32(self.get_partial(Xbd, index=o_ind))
        Xbd = Xbd[self.rng.integers(0, Xbd.shape[0], self.boundary_N)]
        Xtg, Ytg = self.get_target(self.shape_vocabs[index],
                                   self.vocab_idxs[index],
                                   all_target=all_target)
        if self.Xct_as_Xbd:
            Xbd = Xct
        return dict(Xct=Xct.astype(np.float32), Xbd=Xbd.astype(np.float32),
                    Xtg=Xtg.astype(np.float32), Ytg=Ytg.astype(np.float32))

    def get_target(self, shape_vocab, vocab_idx, all_target=False):
        voxels = nputil.decompress_voxels(shape_vocab, vocab_idx)
        grid_dim = voxels.shape[-1]
        if self.target_N == -1 or all_target:
            return self.all_Xtg, voxels.reshape(-1, 1).astype(np.float32)
        inds = self.rng.integers(0, grid_dim, (self.target_N, 3))
        Xtg = nputil.index2point(inds, grid_dim=grid_dim).astype(np.float32)
        Ytg = voxels[inds[:, 0], inds[:, 1], inds[:, 2]][..., None]
        return Xtg, Ytg.astype(np.float32)


def balanced_sampling(Xbd, Xtg, Ytg, target_N=4096, x_dim=3, grid_dim=32,
                      rng=None):
    """v1 balanced target sampling (imnet_datasets.py:272-286): target_N//2
    targets re-drawn at Xtg rows indexed by boundary-point draws, target_N//4
    at occupied cells, target_N//4 at empty cells, plus the boundary points
    themselves appended with soft label 0.5 — so the output has
    1.5 * target_N rows, like the reference's concatenation."""
    rng = rng or np.random.default_rng()
    Ytg_flat = Ytg.reshape(-1)
    inside_pos = np.where(Ytg_flat)[0]
    outside_pos = np.where(1 - Ytg_flat)[0]
    rdc_xbd = rng.integers(0, Xbd.shape[0], target_N // 2)
    sub_Xbd = Xbd[rdc_xbd]
    # the reference's np.random.choice errors on an empty side; all-empty /
    # all-full grids fall back to the other side instead
    inside = inside_pos if len(inside_pos) else outside_pos
    outside = outside_pos if len(outside_pos) else inside_pos
    rdc1 = inside[rng.integers(0, len(inside), target_N // 4)]
    rdc2 = outside[rng.integers(0, len(outside), target_N // 4)]
    choice = np.concatenate([rdc_xbd, rdc1, rdc2])
    sub_Xtg = np.concatenate([Xtg[choice], sub_Xbd])
    sub_Ytg = np.concatenate(
        [Ytg.reshape(-1, 1)[choice],
         np.full((sub_Xbd.shape[0], 1), 0.5, Ytg.dtype)])
    return sub_Xtg, sub_Ytg


def balanced_sampling2(Xbd, Xtg, Ytg, target_N=4096, x_dim=3, grid_dim=32,
                       random_scale=0.1, rng=None):
    """Half the targets drawn near the boundary cloud, half uniform
    (imnet_datasets.py:297-303)."""
    rng = rng or np.random.default_rng()
    rdc_xbd = rng.integers(0, Xbd.shape[0], target_N // 2)
    rdc_uni = rng.integers(0, Xtg.shape[0], target_N - target_N // 2)
    choice = np.concatenate([rdc_xbd, rdc_uni])
    return Xtg[choice], Ytg[choice]


# ------------------------------------------------- offline dataset builders
def generate_dataitem(shape_path):
    """One raw HSP-ShapeNet .mat -> (shape_vocab, vocab_idx, Xbd)
    (imnet_datasets.py:306-319): decompress the blocked 256^3 voxels, convert
    shapenet-v1 axes to cartesian, recompress bit-packed, mesh at 256 and
    area-sample 65536 boundary points."""
    import scipy.io as sio

    from ...utils import geoutil

    loaded = sio.loadmat(shape_path)
    shape_vocab = loaded["b"].reshape(loaded["b"].shape[0], -1)
    vocab_idx = (loaded["bi"] - 1).astype(np.int64).reshape(-1)
    folded = nputil.decompress_voxels(shape_vocab, vocab_idx,
                                      unpackbits=False)
    folded = geoutil.shapenetv2_to_cart(
        geoutil.shapenetv1_to_shapenetv2(folded))
    shape_vocab, vocab_idx = nputil.compress_voxels(folded, packbits=True)
    vert, face = geoutil.array2mesh(
        folded.reshape(-1).astype(np.float32), thresh=0.5,
        bbox=np.array([[-1, -1, -1], [1, 1, 1.]]))
    Xbd = geoutil.sampleMesh(vert, face, 65536)
    return shape_vocab, vocab_idx, Xbd


def _write_imnet_split(shape_names, shape_paths, target_path, type_dict,
                       progress=True):
    from ...utils.h5store import to_object_array, writeh5
    from ...utils.sysutil import progbar

    cates = [[] for _ in type_dict]
    for si, shape_name in enumerate(shape_names):
        cates[type_dict[shape_name.split("/")[0]]].append(si)
    vocabs, idxs, Xbds = [], [], []
    it = progbar(shape_paths) if progress else shape_paths
    for p in it:  # single-core host: serial map (ref uses parallelMap)
        v, i, x = generate_dataitem(p)
        vocabs.append(v)
        idxs.append(i)
        Xbds.append(x)
    data = {"shape_vocab": to_object_array(vocabs),
            "vocab_idx": to_object_array(idxs),
            "Xbd": np.array(Xbds, np.float32)}
    for ci, members in enumerate(cates):
        data[f"cate_{ci}"] = np.array(members, np.int64)
    writeh5(target_path, data)


def make_imnet_dataset(imnet_datapath="datasets/IM-NET",
                       hspnet_datapath="datasets/hsp_shapenet",
                       target_dir="datasets/IMNet2_packed"):
    """Build IMNet2_packed/{train,test}.hdf5 from the raw IM-NET split lists
    and HSP blocked voxels (imnet_datasets.py:321-369)."""
    imnet_path = os.path.join(imnet_datapath, "IMSVR/data")
    hspnet_path = os.path.join(hspnet_datapath, "modelBlockedVoxels256")
    os.makedirs(target_dir, exist_ok=True)
    splits = {}
    for split in ("train", "test"):
        with open(os.path.join(imnet_path,
                               f"all_vox256_img_{split}.txt")) as f:
            splits[split] = [line.strip() for line in f if line.strip()]
    unique_types = np.unique(
        [name.split("/")[0] for name in splits["train"]])
    type_dict = {typ: i for i, typ in enumerate(unique_types)}
    for split, names in splits.items():
        paths = [os.path.join(hspnet_path, name + ".mat") for name in names]
        _write_imnet_split(names, paths,
                           os.path.join(target_dir, f"{split}.hdf5"),
                           type_dict)


def make_imnet64_dataset(packed_dir="datasets/IMNet2_packed",
                         target_dir="datasets/IMNet2_64", grid_dim=64):
    """Derive the 64^3 training set (bit-packed Ytg consumed by
    Imnet2LowResDataset) from IMNet2_packed by max-pool downsampling the
    256^3 occupancy — the layout the reference ships as IMNet2_64
    (imnet_datasets.py:151-180) but whose builder is absent upstream."""
    from ...utils.h5store import readh5, writeh5
    from ...utils.sysutil import progbar

    os.makedirs(target_dir, exist_ok=True)
    for split in ("train", "test"):
        src = readh5(os.path.join(packed_dir, f"{split}.hdf5"))
        n = len(src["vocab_idx"])
        factor = None
        Ytgs = []
        for i in progbar(range(n)):
            vox = nputil.decompress_voxels(src["shape_vocab"][i],
                                           src["vocab_idx"][i])
            if factor is None:
                factor = vox.shape[0] // grid_dim
            pooled = vox.reshape(grid_dim, factor, grid_dim, factor,
                                 grid_dim, factor).max(axis=(1, 3, 5))
            Ytgs.append(np.packbits(pooled.astype(bool).reshape(-1)))
        data = {"Ytg": np.array(Ytgs), "Xbd": src["Xbd"]}
        data.update({k: v for k, v in src.items() if k.startswith("cate_")})
        writeh5(os.path.join(target_dir, f"{split}.hdf5"), data)
