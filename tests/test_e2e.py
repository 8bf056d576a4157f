"""End-to-end pipeline test — the golden-fixture flow of SURVEY.md section 4:
  1. generate a synthetic dataset + demo shapes (IMNet2 layout);
  2. train the scaled-down VQDIF for 2 epochs via the trainer CLI surface;
  3. --mode run demo_vqdif_synth: codec roundtrip -> 64^3 decode -> mesh/eval;
  4. train the scaled-down ShapeFormer on the frozen VQDIF checkpoint;
  5. --mode run demo_shapeformer_synth: partial cloud -> ranked completions.
Exercises: config inherit chain, registry aliases, checkpoint save/resume with
embedded hyperparameters, callbacks, PLY/npz exports.
"""
import os
import shutil

import numpy as np
import pytest

from shapeformer_tpu.data import synthetic

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    ws = tmp_path_factory.mktemp("e2e")
    synthetic.make_synthetic_imnet(str(ws / "datasets" / "SynthIM_32"),
                                   n_train=6, n_test=2, grid_dim=32,
                                   cloud_N=4096)
    synthetic.make_demo_dataset(str(ws / "demo" / "dataset"),
                                names=("shape_a", "shape_b"),
                                boundary_N=4096, context_N=2048)
    shutil.copytree(os.path.join(REPO, "configs", "synthetic"),
                    str(ws / "configs" / "synthetic"))
    return ws


@pytest.fixture(scope="module")
def in_ws(workspace):
    old = os.getcwd()
    os.chdir(workspace)
    yield workspace
    os.chdir(old)


@pytest.mark.e2e
def test_full_pipeline(in_ws):
    from shapeformer_tpu.trainer import main
    ws = str(in_ws)

    # ---- 1. train VQDIF --------------------------------------------------
    main(["--opts", "configs/synthetic/vqdif_synth.yaml", "--mode", "train"])
    ckpt_dir = os.path.join(ws, "experiments/vqdif_synth/checkpoints")
    ckpts = os.listdir(ckpt_dir)
    assert any(c.startswith("epoch") for c in ckpts), ckpts
    assert os.path.exists(os.path.join(ws, "experiments/vqdif_synth/config.yaml"))
    metrics_file = os.path.join(ws, "experiments/vqdif_synth/logs/metrics.jsonl")
    assert os.path.exists(metrics_file)

    # ---- 2. demo_vqdif roundtrip ----------------------------------------
    main(["--opts", "configs/synthetic/demo_vqdif_synth.yaml", "--mode", "run"])
    demo_dir = os.path.join(ws, "experiments/demo_vqdif_synth")
    evals = os.listdir(os.path.join(demo_dir, "eval"))
    assert "shape_a.npz" in evals and "shape_b.npz" in evals
    pc = np.load(os.path.join(demo_dir, "eval", "shape_a.npz"))["eval_pc"]
    assert pc.shape == (10 ** 5, 3)
    meshes = os.listdir(os.path.join(demo_dir, "meshes"))
    assert any(m.endswith(".ply") for m in meshes)
    visuals = os.listdir(os.path.join(demo_dir, "visual"))
    assert any("recon" in v for v in visuals)
    failed = np.loadtxt(os.path.join(demo_dir, "logs/failed_ind/rank_0.txt"))
    assert failed.size == 0, f"failed demo indices: {failed}"

    # ---- 3. train ShapeFormer on the frozen VQDIF ------------------------
    main(["--opts", "configs/synthetic/shapeformer_synth.yaml",
          "--mode", "train"])
    sf_ckpts = os.listdir(
        os.path.join(ws, "experiments/shapeformer_synth/checkpoints"))
    assert any(c.startswith("epoch") for c in sf_ckpts)

    # ---- 4. completion demo ---------------------------------------------
    main(["--opts", "configs/synthetic/demo_shapeformer_synth.yaml",
          "--mode", "run"])
    sf_dir = os.path.join(ws, "experiments/demo_shapeformer_synth")
    failed = np.loadtxt(os.path.join(sf_dir, "logs/failed_ind/rank_0.txt"))
    assert failed.size == 0, f"failed completion indices: {failed}"
    evals = os.listdir(os.path.join(sf_dir, "eval"))
    assert "shape_a.npz" in evals
    data = np.load(os.path.join(sf_dir, "eval", "shape_a.npz"))
    assert "eval_pc" in data and "recon_0" in data
    meshes = os.listdir(os.path.join(sf_dir, "meshes"))
    assert any(m.startswith("shape_a_s0") for m in meshes)
