"""Golden parity on the reference's REAL demo scans (VERDICT r4 #3).

Every other golden test feeds uniform-random clouds or synthetic blobs; this
one pushes the reference's own partial-scan fixtures
(/root/reference/demo/dataset/{armchair,car,gun,sofa}/Xct.npy, loaded by the
reference's ListDataset, list_dataset.py:13-37) through the FULL tokenize
pipeline at the flagship architecture (configs/vqdif/shapenet_res16.yaml:
64^3 grid -> 2-step downsample -> 16^3 x 4096-code VQ) in BOTH frameworks
with transferred weights, and asserts:

  - encoder feature grids allclose,
  - quantizer indices exact (incl. the occupancy-mask + mode fill of
    quantize_cloud, vqdif.py:50-58),
  - sparse token sequences byte-identical (order AND position ids — the
    convention a reference-trained transformer checkpoint was fit on),
  - decoded 64^3 occupancy logits allclose.

Real scans exercise what random clouds cannot: highly non-uniform density,
HPR-style one-sided coverage, and realistic token-occupancy statistics.
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_convert import _install_torch_scatter_shim
from test_golden_torch import _install_reference_stubs

REF_ROOT = "/root/reference"
DEMO_DIR = os.path.join(REF_ROOT, "demo/dataset")
SHAPES = ("armchair", "car", "sofa", "gun")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DEMO_DIR), reason="reference demo dataset not present")

# flagship VQDIF architecture (configs/vqdif/shapenet_res16.yaml)
ENC_KW = dict(c_dim=32, hidden_dim=32, plane_type="grid", grid_resolution=64,
              downsampler=True,
              downsampler_kwargs=dict(in_channels=32, downsample_steps=2))
QUANT_KW = dict(vocab_size=4096, n_embd=128)
DEC_KW = dict(c_dim=32, hidden_size=32, sample_mode="bilinear", unet3d=True,
              unet3d_kwargs=dict(num_levels=3, f_maps=128, in_channels=128,
                                 out_channels=128),
              upsampler=True,
              upsampler_kwargs=dict(in_channels=128, upsampler_steps=2))
END_TOKENS = (4096, 4096)
MAX_LENGTH = 512


def _load_demo_clouds(n_points=4096, seed=314):
    """Stack the demo Xct scans, subsampled like the reference ListDataset
    (list_dataset.py:29-35; seeded here so the fixture is deterministic)."""
    rng = np.random.default_rng(seed)
    clouds = []
    for name in SHAPES:
        xct = np.load(os.path.join(DEMO_DIR, name, "Xct.npy"))
        clouds.append(xct[rng.choice(xct.shape[0], n_points, replace=False)])
    return np.stack(clouds).astype(np.float32)


@pytest.fixture(scope="module")
def ref_flagship():
    """Reference flagship VQDIF (torch, random seeded init) + its
    quantize_cloud inlined (vqdif.py:50-58 — importing the module itself
    drags in xgutils.vis)."""
    _install_torch_scatter_shim()
    _install_reference_stubs()
    import importlib.util

    # batch_dense2sparse needs the real ptutil ravel/unravel, which the
    # lightweight xgutils stub does not carry
    spec = importlib.util.spec_from_file_location(
        "ref_ptutil_demo", f"{REF_ROOT}/xgutils/ptutil.py")
    ref_pt = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_pt)
    import xgutils
    if not hasattr(xgutils.ptutil, "ravel_index"):
        xgutils.ptutil.ravel_index = ref_pt.ravel_index
        xgutils.ptutil.unravel_index = ref_pt.unravel_index

    from shapeformer.models.common import pth_get_mode
    from shapeformer.models.vqdif.dec import LocalDecoder
    from shapeformer.models.vqdif.enc import LocalPoolPointnet
    from shapeformer.models.vqdif.quantizer import Quantizer

    torch.manual_seed(11)
    enc = LocalPoolPointnet(**ENC_KW)
    quant = Quantizer(**QUANT_KW)
    dec = LocalDecoder(dim=3, **DEC_KW)

    class Wrap(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder, self.quantizer, self.decoder = enc, quant, dec

        @torch.no_grad()
        def quantize_cloud(self, cloud):
            grid_feat, grid_mask = self.encoder(cloud / 2.0)
            _, qf_st, q_ind, _ = self.quantizer(grid_feat)
            mode = pth_get_mode(q_ind.reshape(-1))
            quant_ind = torch.zeros_like(q_ind) + mode
            quant_ind[grid_mask] = q_ind[grid_mask]
            return quant_ind, mode, dict(quant_feat=qf_st, grid_feat=grid_feat)

    return Wrap().eval()


@pytest.fixture(scope="module")
def jax_flagship():
    from shapeformer_tpu.models.vqdif.vqdif import VQDIF
    return VQDIF(
        encoder_opt={"class": "shapeformer.models.vqdif.enc.LocalPoolPointnet",
                     "kwargs": ENC_KW},
        quantizer_opt={"class": "shapeformer.models.vqdif.quantizer.Quantizer",
                       "kwargs": QUANT_KW},
        decoder_opt={"class": "shapeformer.models.vqdif.dec.LocalDecoder",
                     "kwargs": DEC_KW},
        vq_beta=0.001)


def test_demo_scans_full_tokenize_parity(ref_flagship, jax_flagship):
    import jax.numpy as jnp

    from shapeformer_tpu.convert import convert_vqdif_state_dict
    from shapeformer_tpu.models.vqdif.vqdif import VQDIF
    from shapeformer_tpu.ops import sparse as sparse_ops

    from shapeformer.models.common import batch_dense2sparse

    clouds = _load_demo_clouds()
    variables = convert_vqdif_state_dict(ref_flagship.state_dict())

    # ---- reference pipeline (torch) ------------------------------------
    with torch.no_grad():
        qi_t, mode_t, enc_t = ref_flagship.quantize_cloud(
            torch.from_numpy(clouds))
        seq_t, _ = batch_dense2sparse(
            qi_t, max_length=MAX_LENGTH,
            end_tokens=torch.tensor(END_TOKENS))

    # ---- this framework (jax) ------------------------------------------
    grid_j, _mask_j = jax_flagship.apply(
        variables, jnp.asarray(clouds), method=VQDIF.encode)
    qi_j, mode_j, _enc_j = jax_flagship.apply(
        variables, jnp.asarray(clouds), method=VQDIF.quantize_cloud)
    seq_j, _ = sparse_ops.dense2sparse(
        qi_j, MAX_LENGTH, END_TOKENS, QUANT_KW["vocab_size"], mode=mode_j)

    # encoder feature grids (canonical layout reverses the spatial axes).
    # At flagship depth (5 ResNet-FC blocks + 2-step downsampler with
    # GroupNorm at f_maps up to 128) f32 reassociation between XLA and torch
    # leaves a small heavy tail (measured: 0.18% of elements beyond 5e-4,
    # max |d| 0.024), so gate on quantiles + relative Frobenius error; the
    # hard exactness gates below (quant_ind, token sequences) are what
    # checkpoint fidelity actually rides on.
    grid_j_as_t = np.transpose(np.asarray(grid_j), (0, 4, 3, 2, 1))
    gt = enc_t["grid_feat"].numpy()
    diff = np.abs(grid_j_as_t - gt)
    within = diff <= 5e-4 + 5e-4 * np.abs(gt)
    assert within.mean() > 0.995, within.mean()
    rel_fro = np.linalg.norm(diff) / np.linalg.norm(gt)
    assert rel_fro < 1e-3, rel_fro
    assert diff.max() < 0.1, diff.max()

    # quantizer indices, incl. mask + mode fill: exact
    assert int(mode_j) == int(mode_t)
    qi_j_as_t = np.transpose(np.asarray(qi_j), (0, 3, 2, 1))
    np.testing.assert_array_equal(qi_j_as_t, qi_t.numpy())

    # realistic occupancy: every real scan yields a non-trivial sparse code
    n_tok = (qi_j_as_t.reshape(len(SHAPES), -1) != int(mode_t)).sum(axis=1)
    assert (n_tok > 8).all() and (n_tok < MAX_LENGTH).all(), n_tok

    # token sequences: byte-identical, order and ids (the convention a
    # converted reference transformer checkpoint was trained on)
    sj = np.asarray(seq_j)
    for b in range(len(SHAPES)):
        st_b = seq_t[b].numpy()
        np.testing.assert_array_equal(
            sj[b, : st_b.shape[0]], st_b,
            err_msg=f"token sequence diverges on demo shape "
                    f"{SHAPES[b]!r}")
        # remaining padding is all end tokens
        assert (sj[b, st_b.shape[0]:] == np.array(END_TOKENS)).all()


def test_demo_scans_decoded_occupancy_parity(ref_flagship, jax_flagship):
    """Quantized-code -> 64^3 occupancy-logit parity on two real scans."""
    import jax.numpy as jnp

    from shapeformer_tpu.convert import convert_vqdif_state_dict
    from shapeformer_tpu.models.vqdif.vqdif import VQDIF
    from shapeformer_tpu.utils.nputil import makeGrid

    clouds = _load_demo_clouds()[:2]           # keep the torch side tractable
    variables = convert_vqdif_state_dict(ref_flagship.state_dict())

    res = 64
    xtg = makeGrid([-1, -1, -1.0], [1.0, 1, 1], [res] * 3,
                   indexing="ij").astype(np.float32)

    with torch.no_grad():
        _, _, enc_t = ref_flagship.quantize_cloud(torch.from_numpy(clouds))
        logits_t = []
        for chunk in torch.split(torch.from_numpy(xtg[None] / 2.0)
                                 .expand(2, -1, -1), 65536, dim=1):
            logits_t.append(ref_flagship.decoder(chunk, enc_t["quant_feat"]))
        logits_t = torch.cat(logits_t, dim=1).numpy()

    encoded = jax_flagship.apply(variables, jnp.asarray(clouds),
                                 method=VQDIF.encode_quant)
    out = jax_flagship.apply(variables, encoded["quant_feat"],
                             jnp.asarray(np.broadcast_to(xtg[None],
                                                         (2,) + xtg.shape)),
                             method=VQDIF.decode)
    got = np.asarray(out["logits"])
    diff = np.abs(got - logits_t)
    within = diff <= 2e-3 + 2e-3 * np.abs(logits_t)
    assert within.mean() > 0.995, within.mean()
    rel_fro = np.linalg.norm(diff) / np.linalg.norm(logits_t)
    assert rel_fro < 2e-3, rel_fro
    # occupancy decisions: the sign of virtually every logit agrees (with
    # random weights logits sit near zero, so a handful of boundary queries
    # may flip under f32 reassociation; measured 0.99985)
    sign_agree = ((got > 0) == (logits_t > 0)).mean()
    assert sign_agree > 0.999, sign_agree
    # the real scans must decode to non-degenerate fields (both phases seen)
    probs = 1.0 / (1.0 + np.exp(-got))
    frac = (probs > 0.5).mean(axis=1)
    assert ((frac > 0.0005) & (frac < 0.9995)).all(), frac
