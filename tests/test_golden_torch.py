"""Golden-value fidelity tests against PyTorch (VERDICT r1 weak #6).

The reference publishes no checkpoints, but torch (cpu) is available, so the
numerics of the two load-bearing device ops are pinned directly:
  - ops.grid_sample.trilinear_sample vs torch F.grid_sample with the exact
    reference flags (mode='bilinear', padding_mode='border',
    align_corners=True; shapeformer/models/vqdif/dec.py:62-68);
  - CondTupleGPT teacher-forced logits vs the REFERENCE torch CondTupleGPT
    (loaded from /root/reference/.../mingpt.py, which imports only torch)
    with weights transferred — proving a converted reference checkpoint
    would reproduce its logits on this implementation.
"""
import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_MINGPT = "/root/reference/shapeformer/models/shapeformer/transformer/mingpt.py"


def test_trilinear_sample_matches_torch_grid_sample(rng):
    from shapeformer_tpu.ops.grid_sample import trilinear_sample

    B, X, Y, Z, C, M = 2, 5, 6, 7, 4, 200
    grid = rng.normal(size=(B, X, Y, Z, C)).astype(np.float32)
    # include out-of-range coords to pin border padding
    p01 = rng.uniform(-0.2, 1.2, (B, M, 3)).astype(np.float32)

    got = np.asarray(trilinear_sample(jnp.asarray(grid), jnp.asarray(p01)))

    t_grid = torch.from_numpy(grid).permute(0, 4, 1, 2, 3)  # (B, C, X, Y, Z)
    # torch grid coords: last dim (x, y, z) indexes (W, H, D) = (Z, Y, X)
    t_coords = torch.from_numpy(2.0 * p01[..., ::-1].copy() - 1.0)
    t_out = torch.nn.functional.grid_sample(
        t_grid, t_coords[:, :, None, None, :], mode="bilinear",
        padding_mode="border", align_corners=True)
    want = t_out[:, :, :, 0, 0].permute(0, 2, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(not os.path.exists(REF_MINGPT),
                    reason="reference tree not present")
def test_condtuplegpt_matches_reference_torch():
    """Weight-transferred logits parity with the reference transformer."""
    from shapeformer_tpu.models.shapeformer.transformer.mingpt import \
        CondTupleGPT

    spec = importlib.util.spec_from_file_location("ref_mingpt", REF_MINGPT)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    torch.manual_seed(0)
    kw = dict(vocab_sizes=(9, 17), extra_vocab_sizes=(9,), block_size=16,
              tuple_n=2, n_layers=(2, 1), n_head=2, n_embd=32)
    tmodel = ref.CondTupleGPT(**kw, embd_pdrop=0.0, resid_pdrop=0.0,
                              attn_pdrop=0.0).eval()
    jmodel = CondTupleGPT(**kw)

    B, L, L_c = 2, 10, 6
    g = np.random.default_rng(1)
    idx = g.integers(0, 9, (B, L, 2)).astype(np.int64)
    idx[..., 1] = g.integers(0, 17, (B, L))
    extra = g.integers(0, 9, (B, L, 1)).astype(np.int64)
    target = np.roll(idx, -1, axis=1)

    with torch.no_grad():
        want = tmodel(torch.from_numpy(idx), torch.from_numpy(extra),
                      L_cond=L_c, target_idx=torch.from_numpy(target))
        want = [w.numpy() for w in want]

    params = {"params": _transfer_weights(tmodel, kw)}
    got = jmodel.apply(params, jnp.asarray(idx), jnp.asarray(extra), L_c,
                       jnp.asarray(target), deterministic=True)
    for a, b in zip(want, got):
        np.testing.assert_allclose(np.asarray(b), a, rtol=2e-4, atol=2e-4)


def _t(w):
    return jnp.asarray(w.detach().numpy())


def _transfer_weights(tmodel, kw):
    """Reference torch state -> flax param tree (the ckpt conversion recipe,
    SURVEY.md section 7 'ckpt conversion')."""
    p = {}
    for i, emb in enumerate(tmodel.tok_embs):
        p[f"tok_embs_{i}"] = {"embedding": _t(emb.weight)}
    for i, emb in enumerate(tmodel.extra_tok_embs):
        p[f"extra_tok_embs_{i}"] = {"embedding": _t(emb.weight)}
    p["pos_emb"] = _t(tmodel.pos_emb)
    p["cond_pos_emb"] = _t(tmodel.cond_pos_emb)
    for i, stage in enumerate(tmodel.blocks):
        for j, blk in enumerate(stage):
            attn = blk.attn
            qkv_kernel = jnp.concatenate(
                [_t(attn.query.weight).T, _t(attn.key.weight).T,
                 _t(attn.value.weight).T], axis=1)
            qkv_bias = jnp.concatenate(
                [_t(attn.query.bias), _t(attn.key.bias), _t(attn.value.bias)])
            p[f"stages_{i}_{j}"] = {
                "ln1": {"scale": _t(blk.ln1.weight), "bias": _t(blk.ln1.bias)},
                "ln2": {"scale": _t(blk.ln2.weight), "bias": _t(blk.ln2.bias)},
                "attn": {
                    "qkv": {"kernel": qkv_kernel, "bias": qkv_bias},
                    "proj": {"kernel": _t(attn.proj.weight).T,
                             "bias": _t(attn.proj.bias)},
                },
                "fc1": {"kernel": _t(blk.mlp[0].weight).T,
                        "bias": _t(blk.mlp[0].bias)},
                "fc2": {"kernel": _t(blk.mlp[2].weight).T,
                        "bias": _t(blk.mlp[2].bias)},
            }
    for i, head in enumerate(tmodel.heads):
        p[f"heads_{i}"] = {
            "LayerNorm_0": {"scale": _t(head[0].weight),
                            "bias": _t(head[0].bias)},
            "Dense_0": {"kernel": _t(head[-1].weight).T},
        }
    return p


REF_ROOT = "/root/reference"


@pytest.mark.skipif(not os.path.exists(REF_MINGPT),
                    reason="reference tree not present")
def test_local_decoder_matches_reference_torch(rng):
    """Weight-transferred implicit-decoder parity (query MLP + trilinear
    feature sampling) vs the reference torch LocalDecoder
    (shapeformer/models/vqdif/dec.py:10-100, unet/upsampler off).

    Also pins the axis convention: the reference samples torch grids
    (B, C, s0, s1, s2) with unreversed (x, y, z) coords, i.e. x indexes the
    LAST spatial dim; the canonical channels-last layout here is therefore
    the reference grid with spatial axes reversed."""
    import sys
    sys.path.insert(0, REF_ROOT)
    from shapeformer.models.vqdif.dec import LocalDecoder as RefDecoder

    from shapeformer_tpu.models.vqdif.dec import LocalDecoder

    torch.manual_seed(0)
    C, H = 6, 8
    tdec = RefDecoder(dim=3, c_dim=C, hidden_size=H, n_blocks=5,
                      unet3d=False, unet3d_kwargs=None,
                      upsampler=False, upsampler_kwargs=None).eval()
    jdec = LocalDecoder(dim=3, c_dim=C, hidden_size=H, n_blocks=5)

    B, R, M = 2, 5, 64
    grid_t = rng.normal(size=(B, C, R, R, R)).astype(np.float32)
    p = rng.uniform(-0.5, 0.5, (B, M, 3)).astype(np.float32)
    with torch.no_grad():
        want = tdec(torch.from_numpy(p), torch.from_numpy(grid_t)).numpy()

    params = {"fc_p": _lin(tdec.fc_p), "fc_out": _lin(tdec.fc_out)}
    for i in range(5):
        params[f"fc_c_{i}"] = _lin(tdec.fc_c[i])
        params[f"blocks_{i}"] = {"fc_0": _lin(tdec.blocks[i].fc_0),
                                 "fc_1": _lin(tdec.blocks[i].fc_1)}
    grid_j = np.transpose(grid_t, (0, 4, 3, 2, 1))   # (B, s2, s1, s0, C)
    got = jdec.apply({"params": params}, jnp.asarray(p), jnp.asarray(grid_j))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def _lin(mod):
    out = {"kernel": _t(mod.weight).T}
    if mod.bias is not None:
        out["bias"] = _t(mod.bias)
    return out
