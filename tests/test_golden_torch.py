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


def _install_reference_stubs():
    """Stub the reference tree's unavailable heavy deps: pytorch_lightning
    (plain nn.Module base), igl, mcubes, and xgutils (only
    sysutil.progbar/load_object are touched on the sampling path).  ONE
    shared installer — a second, weaker stub would preempt this one via the
    sys.modules guard and make the golden tests order-dependent."""
    import importlib
    import sys
    import types

    if "pytorch_lightning" not in sys.modules or not hasattr(
            sys.modules["pytorch_lightning"], "LightningModule"):
        plm = types.ModuleType("pytorch_lightning")

        class LightningModule(torch.nn.Module):
            def save_hyperparameters(self, *a, **kw):
                pass
        plm.LightningModule = LightningModule
        plm.Callback = type("Callback", (), {})
        sys.modules["pytorch_lightning"] = plm
    sys.modules.setdefault("igl", types.ModuleType("igl"))
    sys.modules.setdefault("mcubes", types.ModuleType("mcubes"))
    if "xgutils" not in sys.modules:
        xg = types.ModuleType("xgutils")
        sysutil = types.ModuleType("xgutils.sysutil")
        sysutil.progbar = lambda it, *a, **kw: it

        def load_object(path):   # RAW import — must NOT alias to *_tpu
            mod, name = path.rsplit(".", 1)
            return getattr(importlib.import_module(mod), name)
        sysutil.load_object = load_object
        sysutil.instantiate_from_opt = lambda opt: load_object(
            opt["class"])(**(opt.get("kwargs") or {}))
        xg.sysutil = sysutil
        xg.nputil = types.ModuleType("xgutils.nputil")
        xg.ptutil = types.ModuleType("xgutils.ptutil")
        plutil = types.ModuleType("xgutils.plutil")

        class VisCallback:           # base of the module-level VisShapeFormer
            def __init__(self, **kw):
                pass
        plutil.VisCallback = VisCallback
        xg.plutil = plutil
        xg.__all__ = ["sysutil", "nputil", "ptutil", "plutil"]
        sys.modules["xgutils"] = xg
        sys.modules["xgutils.sysutil"] = sysutil
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)


def _logp_from_hist(hist, x_ref):
    """Accumulated log-prob of the sampled tokens under the reference's
    masked logits history (its ranking key, shapeformer.py:407-418)."""
    B, T_ref = x_ref.shape[0], x_ref.shape[1]
    want = np.zeros(B)
    for i in range(len(hist)):
        h = np.asarray(hist[i], np.float64)
        m = h.max(-1, keepdims=True)
        lp = h - m - np.log(np.exp(h - m).sum(-1, keepdims=True))
        for b in range(B):
            for j in range(T_ref):
                want[b] += lp[b, j, x_ref[b, j, i]]
    return want


def _import_reference_sampler():
    """Reference ShapeFormer module (sampling loop + maskers), deps stubbed."""
    import importlib

    _install_reference_stubs()
    ref_sf = importlib.import_module(
        "shapeformer.models.shapeformer.shapeformer")
    ref_repr = importlib.import_module(
        "shapeformer.models.shapeformer.representers")
    return ref_sf, ref_repr


@pytest.mark.skipif(not os.path.exists(REF_MINGPT),
                    reason="reference tree not present")
def test_sampling_trajectory_matches_reference_torch():
    """Golden AR-sampling trajectory (VERDICT r2 #3): run the REFERENCE's own
    sample_indices loop (shapeformer/models/shapeformer/shapeformer.py:55-123
    — its maskers, generator protocol, end forcing) on a tiny CondTupleGPT
    with transferred weights at argmax temperature (top_k=1), and require
    token-for-token equality plus matching accumulated log-probs from the
    KV-cached jax sampler."""
    from shapeformer_tpu.models.shapeformer.shapeformer import ShapeFormer

    ref_sf_mod, ref_repr = _import_reference_sampler()

    # NOTE on padding: the reference ATTENDS its end-token padding (its codec
    # always pads to max_length and nothing masks keys,
    # common.py:84-123 / mingpt.py:82-86), whereas this framework masks
    # padding out consistently in training and sampling.  The two semantics
    # coincide exactly when the condition is full-length, which is what this
    # trajectory test uses; the teacher-forced golden logits test above runs
    # with key_valid=None, which models the reference's padded batches.
    torch.manual_seed(0)
    POS_V, VAL_V, BLOCK, MAXLEN = 17, 17, 24, 12
    END = (16, 16)
    kw = dict(vocab_sizes=(POS_V, VAL_V), extra_vocab_sizes=(POS_V,),
              block_size=BLOCK, tuple_n=2, n_layers=(2, 1), n_head=2,
              n_embd=32)
    tf_kwargs = dict(kw, embd_pdrop=0.0, resid_pdrop=0.0, attn_pdrop=0.0)
    sf_ref = ref_sf_mod.ShapeFormer(
        tuple_n=2, block_size=BLOCK, end_tokens=END,
        vocab_sizes=kw["vocab_sizes"],
        extra_vocab_sizes=kw["extra_vocab_sizes"], voxel_res=4,
        transformer_opt={"class": "shapeformer.models.shapeformer"
                                  ".transformer.mingpt.CondTupleGPT",
                         "kwargs": tf_kwargs},
        representer_opt={"class": "shapeformer.models.shapeformer"
                                  ".representers.Representer", "kwargs": {}})

    class _ARN(ref_repr.AR_N):
        """Reference AR_N with the vqvae checkpoint load bypassed (its
        get_extra_indices / sampling_masker code paths are untouched)."""

        def __init__(self):
            torch.nn.Module.__init__(self)
            self.voxel_res = 4
            self.end_tokens = END
            self.input_end_tokens = END
            self.block_size = BLOCK
            self.max_length = BLOCK // 2
            self.uncond = False
            self.no_val_ind = False
            self.cloud_shrinkage = 1.0
            self.mask_invalid = True
            self.mask_invalid_completion = True

    sf_ref.representer = _ARN()
    sf_ref.transformer.eval()

    # ours, with the SAME weights
    import jax
    import jax.numpy as jnp
    sf = ShapeFormer(
        tuple_n=2, block_size=BLOCK, end_tokens=END,
        vocab_sizes=kw["vocab_sizes"],
        extra_vocab_sizes=kw["extra_vocab_sizes"], voxel_res=2,
        transformer_opt={"class": "shapeformer_tpu.models.shapeformer"
                                  ".transformer.mingpt.CondTupleGPT",
                         "kwargs": dict(kw, cache_dtype=jnp.float32)},
        representer_opt={"class": "shapeformer_tpu.models.shapeformer"
                                  ".representers.AR_N",
                         "kwargs": dict(voxel_res=4, end_tokens=END,
                                        block_size=BLOCK, mask_invalid=True,
                                        mask_invalid_completion=True)})
    params = {"params": _transfer_weights(sf_ref.transformer, kw)}

    # condition rows with exactly ONE trailing end token: the reference's
    # get_next_cond requires an end sentinel in the condition
    # (representers.py:432-442 gathers at searchsorted index), and a single
    # end token is attended by BOTH implementations (token_mask includes the
    # first end token), so the semantics coincide (see the padding note)
    g = np.random.default_rng(7)
    c = np.zeros((2, MAXLEN, 2), np.int64)
    c[..., 0], c[..., 1] = END
    c[0, :11, 0] = np.arange(11)                             # 0..10
    c[1, :11, 0] = np.arange(11) + 2                         # 2..12
    c[0, :11, 1] = g.integers(0, VAL_V - 1, 11)
    c[1, :11, 1] = g.integers(0, VAL_V - 1, 11)

    max_steps = 12
    tc = torch.from_numpy(c)
    with torch.no_grad():
        x_ref, hist = sf_ref.sample_indices(
            c_indices=tc, z_indices=tc[:, :0, :], max_steps=max_steps,
            top_k=1, top_p=0.001, temperature=1.0)
    x_ref = x_ref.numpy()                                    # (B, T_ref, 2)

    toks, logp = sf.sample_indices(params, jnp.asarray(c),
                                   jax.random.PRNGKey(0),
                                   max_steps=max_steps, top_k=1, top_p=0.001)
    toks, logp = np.asarray(toks), np.asarray(logp)

    T_ref = x_ref.shape[1]
    assert T_ref >= 1
    np.testing.assert_array_equal(toks[:, :T_ref, :], x_ref,
                                  err_msg="sampled token trajectories differ")
    # beyond the reference's stop, ours must be pure end-padding
    assert (toks[:, T_ref:, 0] == END[0]).all()
    assert (toks[:, T_ref:, 1] == END[1]).all()

    # accumulated log-prob of the sampled tokens under the MASKED logits
    # (the ranking key; reference computes it from logits_history,
    # shapeformer.py:407-418)
    want = _logp_from_hist(hist, x_ref)
    np.testing.assert_allclose(logp, want, rtol=1e-3, atol=1e-3,
                               err_msg="accumulated log-probs differ")


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


@pytest.mark.skipif(not os.path.exists(REF_MINGPT),
                    reason="reference tree not present")
@pytest.mark.parametrize("rep_name", ["RR", "RR_AR", "AR_RR"])
def test_rr_sampling_trajectory_matches_reference_torch(rep_name):
    """Golden RR / RR_AR trajectories: the reference's delta-coded masker
    (feasibility budget, no-zero-delta monotonicity, alive-rows-cannot-emit-
    end-value) and, for RR_AR, its per-step extra-channel recompute (absolute
    extras from the converted buffer) — against the KV-cached jax sampler at
    argmax temperature, token for token."""
    from shapeformer_tpu.models.shapeformer.shapeformer import ShapeFormer

    ref_sf_mod, ref_repr = _import_reference_sampler()

    torch.manual_seed(1)
    # consistent coding: voxel_res=2 -> 8 raveled positions, end token 8;
    # the feasibility budget (res^3-1 = 7) binds within a few steps.  The
    # condition must be FULL length (real tokens + exactly one trailing
    # end): the reference attends padding, this framework masks it, and the
    # two coincide only at full length (see the AR trajectory test's note).
    POS_V, VAL_V, BLOCK, MAXLEN = 9, 17, 12, 6
    END = (8, 16)
    RES = 2
    kw = dict(vocab_sizes=(POS_V, VAL_V), extra_vocab_sizes=(POS_V,),
              block_size=BLOCK, tuple_n=2, n_layers=(2, 1), n_head=2,
              n_embd=32)
    tf_kwargs = dict(kw, embd_pdrop=0.0, resid_pdrop=0.0, attn_pdrop=0.0)
    sf_ref = ref_sf_mod.ShapeFormer(
        tuple_n=2, block_size=BLOCK, end_tokens=END,
        vocab_sizes=kw["vocab_sizes"],
        extra_vocab_sizes=kw["extra_vocab_sizes"], voxel_res=RES,
        transformer_opt={"class": "shapeformer.models.shapeformer"
                                  ".transformer.mingpt.CondTupleGPT",
                         "kwargs": tf_kwargs},
        representer_opt={"class": "shapeformer.models.shapeformer"
                                  ".representers.Representer", "kwargs": {}})

    ref_cls = getattr(ref_repr, rep_name)

    class _Rep(ref_cls):
        def __init__(self):
            torch.nn.Module.__init__(self)
            self.voxel_res = RES
            self.end_tokens = END
            self.input_end_tokens = END
            self.block_size = BLOCK
            self.max_length = BLOCK // 2
            self.uncond = False
            self.no_val_ind = False
            self.cloud_shrinkage = 1.0
            self.mask_invalid = True
            self.mask_invalid_completion = False

    sf_ref.representer = _Rep()
    sf_ref.transformer.eval()

    import jax
    import jax.numpy as jnp
    sf = ShapeFormer(
        tuple_n=2, block_size=BLOCK, end_tokens=END,
        vocab_sizes=kw["vocab_sizes"],
        extra_vocab_sizes=kw["extra_vocab_sizes"], voxel_res=RES,
        transformer_opt={"class": "shapeformer_tpu.models.shapeformer"
                                  ".transformer.mingpt.CondTupleGPT",
                         "kwargs": dict(kw, cache_dtype=jnp.float32)},
        representer_opt={"class": "shapeformer_tpu.models.shapeformer"
                                  f".representers.{rep_name}",
                         "kwargs": dict(voxel_res=RES, end_tokens=END,
                                        block_size=BLOCK)})
    params = {"params": _transfer_weights(sf_ref.transformer, kw)}

    # AR-coded condition with one trailing end token, converted to the
    # representer's delta coding on BOTH sides (get_indices would do this)
    g = np.random.default_rng(11)
    c_ar = np.zeros((2, MAXLEN, 2), np.int64)
    c_ar[..., 0], c_ar[..., 1] = END
    c_ar[0, :5, 0] = [0, 2, 3, 5, 7]
    c_ar[1, :5, 0] = [1, 2, 4, 5, 6]
    c_ar[0, :5, 1] = g.integers(0, VAL_V - 1, 5)
    c_ar[1, :5, 1] = g.integers(0, VAL_V - 1, 5)
    tc_ar = torch.from_numpy(c_ar)
    tc, _ = sf_ref.representer.convert_input_indices(tc_ar, tc_ar[:, :0, :])

    max_steps = 6
    with torch.no_grad():
        x_ref, hist = sf_ref.sample_indices(
            c_indices=tc, z_indices=tc[:, :0, :], max_steps=max_steps,
            top_k=1, top_p=0.001, temperature=1.0)
    x_ref = x_ref.numpy()

    toks, logp = sf.sample_indices(params, jnp.asarray(tc.numpy()),
                                   jax.random.PRNGKey(0),
                                   max_steps=max_steps, top_k=1, top_p=0.001)
    toks, logp = np.asarray(toks), np.asarray(logp)

    T_ref = x_ref.shape[1]
    assert T_ref >= 1
    np.testing.assert_array_equal(
        toks[:, :T_ref, :], x_ref,
        err_msg=f"{rep_name} sampled token trajectories differ")
    assert (toks[:, T_ref:, 0] == END[0]).all()
    assert (toks[:, T_ref:, 1] == END[1]).all()

    want = _logp_from_hist(hist, x_ref)
    np.testing.assert_allclose(logp, want, rtol=1e-3, atol=1e-3,
                               err_msg=f"{rep_name} log-probs differ")


@pytest.mark.skipif(not os.path.exists(REF_MINGPT),
                    reason="reference tree not present")
def test_au_sampling_trajectory_matches_reference_torch():
    """Golden AU (z, y, x, val) 4-tuple trajectory: the reference's
    lexicographic-growth masker and 4-stage generator protocol vs the
    generalized KV-cached jax sampler, token for token at argmax."""
    from shapeformer_tpu.models.shapeformer.shapeformer import ShapeFormer

    ref_sf_mod, ref_repr = _import_reference_sampler()

    torch.manual_seed(2)
    R, V = 2, 16
    AU_END = (R, R, R, V)
    AR_END = (R ** 3, V)
    vocab = (R + 1, R + 1, R + 1, V + 1)
    BLOCK, MAXLEN = 12, 6
    kw = dict(vocab_sizes=vocab, extra_vocab_sizes=(2,), block_size=BLOCK,
              tuple_n=4, n_layers=(2, 1, 1, 1), n_head=2, n_embd=32)
    tf_kwargs = dict(kw, embd_pdrop=0.0, resid_pdrop=0.0, attn_pdrop=0.0)
    sf_ref = ref_sf_mod.ShapeFormer(
        tuple_n=4, block_size=BLOCK, end_tokens=AU_END, vocab_sizes=vocab,
        extra_vocab_sizes=(2,), voxel_res=R,
        transformer_opt={"class": "shapeformer.models.shapeformer"
                                  ".transformer.mingpt.CondTupleGPT",
                         "kwargs": tf_kwargs},
        representer_opt={"class": "shapeformer.models.shapeformer"
                                  ".representers.Representer", "kwargs": {}})

    class _AU(ref_repr.AU):
        def __init__(self):
            torch.nn.Module.__init__(self)
            self.voxel_res = R
            self.end_tokens = AU_END
            self.input_end_tokens = AR_END
            self.block_size = BLOCK
            self.max_length = BLOCK // 2
            self.uncond = False
            self.no_val_ind = False
            self.cloud_shrinkage = 1.0
            self.mask_invalid = True
            self.mask_invalid_completion = False
            self.AR_end_token = R ** 3
            self.AU_end_token = R

    sf_ref.representer = _AU()
    sf_ref.transformer.eval()

    import jax
    import jax.numpy as jnp
    sf = ShapeFormer(
        tuple_n=4, block_size=BLOCK, end_tokens=AU_END, vocab_sizes=vocab,
        extra_vocab_sizes=(2,), voxel_res=R,
        transformer_opt={"class": "shapeformer_tpu.models.shapeformer"
                                  ".transformer.mingpt.CondTupleGPT",
                         "kwargs": dict(kw, cache_dtype=jnp.float32)},
        representer_opt={"class": "shapeformer_tpu.models.shapeformer"
                                  ".representers.AU",
                         "kwargs": dict(voxel_res=R, end_tokens=AU_END,
                                        input_end_tokens=AR_END,
                                        block_size=BLOCK)})
    params = {"params": _transfer_weights(sf_ref.transformer, kw)}

    # full-length AR condition (5 real + one trailing end), converted to AU
    # 4-tuples on both sides
    g = np.random.default_rng(13)
    c_ar = np.zeros((2, MAXLEN, 2), np.int64)
    c_ar[..., 0], c_ar[..., 1] = AR_END
    c_ar[0, :5, 0] = [0, 2, 3, 5, 7]
    c_ar[1, :5, 0] = [1, 2, 4, 5, 6]
    c_ar[0, :5, 1] = g.integers(0, V - 1, 5)
    c_ar[1, :5, 1] = g.integers(0, V - 1, 5)
    tc_ar = torch.from_numpy(c_ar)
    tc, _ = sf_ref.representer.convert_input_indices(tc_ar, tc_ar[:, :0, :])

    max_steps = 6
    with torch.no_grad():
        x_ref, hist = sf_ref.sample_indices(
            c_indices=tc, z_indices=tc[:, :0, :], max_steps=max_steps,
            top_k=1, top_p=0.001, temperature=1.0)
    x_ref = x_ref.numpy()

    toks, logp = sf.sample_indices(params, jnp.asarray(tc.numpy()),
                                   jax.random.PRNGKey(0),
                                   max_steps=max_steps, top_k=1, top_p=0.001)
    toks, logp = np.asarray(toks), np.asarray(logp)

    T_ref = x_ref.shape[1]
    assert T_ref >= 1
    np.testing.assert_array_equal(toks[:, :T_ref, :], x_ref,
                                  err_msg="AU sampled trajectories differ")
    for i, e in enumerate(AU_END):
        assert (toks[:, T_ref:, i] == e).all()

    want = _logp_from_hist(hist, x_ref)
    np.testing.assert_allclose(logp, want, rtol=1e-3, atol=1e-3,
                               err_msg="AU log-probs differ")


REF_GEOUTIL = "/root/reference/xgutils/geoutil.py"


@pytest.mark.skipif(not os.path.exists(REF_GEOUTIL),
                    reason="reference tree not present")
def test_hidden_point_removal_matches_reference():
    """Golden HPR geometry (the virtual-scan selectors' core,
    data/partial.py): exec the reference's sphericalFlip verbatim
    (xgutils/geoutil.py:58-66) and require the same ConvexHull-visible
    subset.  Note: the reference's own visible extraction
    (`hull.vertices[:-1]`, :72) assumes qhull lists the appended origin
    LAST — when it doesn't, the reference indexes out of bounds; this
    framework filters `vertices < len(cloud)` instead, so the comparison
    uses the index-safe extraction on the reference's flipped points."""
    from scipy.spatial import ConvexHull

    from shapeformer_tpu.utils import geoutil as our_geo

    src = open(REF_GEOUTIL).read()
    start = src.index("def sphericalFlip")
    end = src.index("def hidden_point_removal")
    ns = {"np": np}
    exec(src[start:end], ns)                      # reference flip, verbatim
    ref_flip = ns["sphericalFlip"]

    rng = np.random.default_rng(3)
    cloud = rng.normal(size=(400, 3))
    cloud /= np.linalg.norm(cloud, axis=1, keepdims=True)   # unit sphere
    cloud *= rng.uniform(0.8, 1.0, (400, 1))
    campos = np.array([0.0, 0.0, 3.0])

    flipped = ref_flip(cloud.copy(), np.array([campos]), np.pi)
    pts = np.append(flipped, [[0, 0, 0]], axis=0)
    hull = ConvexHull(pts)
    want = set(int(v) for v in hull.vertices if v < len(cloud))

    got = our_geo.hidden_point_removal(cloud, campos)
    got_idx = set()
    for p in got:
        d = np.linalg.norm(cloud - p[None], axis=1)
        got_idx.add(int(np.argmin(d)))
    assert got_idx == want
    # sanity: some points are occluded, and the hidden ones sit lower
    # (away from the overhead camera) than the visible ones on average
    assert 0 < len(want) < len(cloud)
    hidden = sorted(set(range(len(cloud))) - want)
    assert np.mean(cloud[hidden, 2]) < np.mean(cloud[list(want), 2])


REF_PTUTIL = "/root/reference/xgutils/ptutil.py"


def _import_reference_ptutil():
    import importlib.util

    _install_reference_stubs()
    spec = importlib.util.spec_from_file_location("ref_ptutil", REF_PTUTIL)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


@pytest.mark.skipif(not os.path.exists(REF_PTUTIL),
                    reason="reference tree not present")
def test_ptutil_codecs_match_reference():
    """Golden numeric parity for the data-side codecs the IMNet builders
    depend on: z-order (Morton) ravel/unravel, cube un/folding, and the
    256^3 -> 16^3-block vocab compression (ptutil.py:236-285,396-423)."""
    from shapeformer_tpu.utils import nputil

    ref = _import_reference_ptutil()
    g = np.random.default_rng(4)

    # z-order ravel/unravel
    coords = g.integers(0, 8, (64, 3))
    want = ref.ravel_index_zorder(torch.from_numpy(coords), depth=3).numpy()
    got = np.asarray(nputil.ravel_index_zorder(coords, depth=3))
    np.testing.assert_array_equal(got, want)

    # unfold/fold cube roundtrip equivalence (the reference fold_cube only
    # supports n_blocks == block_volume, the regime decompress_voxels uses)
    vol = g.random((4, 4, 4)).astype(np.float32)
    want_u = ref.unfold_cube(torch.from_numpy(vol), last_dims=3, size=2,
                             step=2).numpy()
    got_u = np.asarray(nputil.unfold_cube(vol, last_dims=3, size=2, step=2))
    np.testing.assert_array_equal(got_u, want_u)
    want_f = ref.fold_cube(torch.from_numpy(want_u), N=3).numpy()
    got_f = np.asarray(nputil.fold_cube(got_u, N=3))
    np.testing.assert_array_equal(got_f, want_f)

    # 256^3 block compression (np.bool was removed from modern numpy; the
    # reference uses it, so shim it for the call)
    vox = np.zeros((256, 256, 256), np.float32)
    vox[10:40, 50:90, 100:140] = 1.0          # empty + full + partial blocks
    vox[0:16, 0:16, 0:16] = 1.0               # one exactly-full block
    if not hasattr(np, "bool"):
        np.bool = bool
        added = True
    else:
        added = False
    try:
        want_vocab, want_idx = ref.compress_voxels(vox, packbits=True)
    finally:
        if added:
            del np.bool
    got_vocab, got_idx = nputil.compress_voxels(vox, packbits=True)
    np.testing.assert_array_equal(got_idx, np.asarray(want_idx))
    np.testing.assert_array_equal(got_vocab, np.asarray(want_vocab))
    # and the decompression roundtrip restores the volume
    back = nputil.decompress_voxels(got_vocab, got_idx)
    np.testing.assert_array_equal(back.astype(np.float32), vox)
