"""VQDIF model tests: shapes, quantizer EMA, straight-through gradients,
quantize_cloud mode-fill, chunked decode equivalence, loss + one optim step.

Scaled-down version of configs/vqdif/shapenet_res16.yaml (grid 16 -> 8,
1 downsample step) so the whole suite runs on the CPU test mesh.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from shapeformer_tpu.models.vqdif import vqdif as vqdif_mod
from shapeformer_tpu.models.vqdif.vqdif import VQDIF, get_loss, vq_loss

GRID = 16
VQ_DIM = 32
VOCAB = 64

MODEL_KWARGS = dict(
    encoder_opt=dict(
        cls="shapeformer_tpu.models.vqdif.enc.LocalPoolPointnet",
        kwargs=dict(hidden_dim=16, plane_type="grid", grid_resolution=GRID,
                    c_dim=16, downsampler=True,
                    downsampler_kwargs=dict(in_channels=16, downsample_steps=1)),
    ),
    quantizer_opt=dict(
        cls="shapeformer_tpu.models.vqdif.quantizer.Quantizer",
        kwargs=dict(vocab_size=VOCAB, n_embd=VQ_DIM),
    ),
    vq_beta=0.001,
    decoder_opt=dict(
        cls="shapeformer.models.vqdif.dec.LocalDecoder",  # exercises aliasing
        kwargs=dict(sample_mode="bilinear", hidden_size=16, c_dim=16,
                    unet3d=True,
                    unet3d_kwargs=dict(num_levels=2, f_maps=VQ_DIM,
                                       in_channels=VQ_DIM, out_channels=VQ_DIM),
                    upsampler=True,
                    upsampler_kwargs=dict(in_channels=VQ_DIM, upsampler_steps=1)),
    ),
)


def _fix_opt(d):
    return {("class" if k == "cls" else k): (_fix_opt(v) if isinstance(v, dict) else v)
            for k, v in d.items()}


@pytest.fixture(scope="module")
def model_and_vars():
    kwargs = {k: (_fix_opt(v) if isinstance(v, dict) else v)
              for k, v in MODEL_KWARGS.items()}
    model = VQDIF(**kwargs)
    rng = np.random.default_rng(0)
    Xbd = jnp.asarray(rng.uniform(-0.9, 0.9, (2, 128, 3)), jnp.float32)
    Xtg = jnp.asarray(rng.uniform(-1, 1, (2, 256, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), Xbd, Xtg)
    return model, variables, Xbd, Xtg


def test_forward_shapes(model_and_vars):
    model, variables, Xbd, Xtg = model_and_vars
    out = model.apply(variables, Xbd, Xtg)
    r = GRID // 2  # one downsample step
    assert out["logits"].shape == (2, 256, 1)
    assert out["quant_ind"].shape == (2, r, r, r)
    assert out["quant_feat"].shape == (2, r, r, r, VQ_DIM)
    assert out["grid_mask"].shape == (2, r, r, r)
    assert out["grid_mask"].sum() > 0
    assert np.isfinite(np.asarray(out["logits"])).all()


def test_quantizer_ema_updates(model_and_vars):
    model, variables, Xbd, Xtg = model_and_vars
    out, updated = model.apply(variables, Xbd, Xtg, train=True, mutable=["vq"])
    old_cb = variables["vq"]["quantizer"]["codebook"]
    new_cb = updated["vq"]["quantizer"]["codebook"]
    assert not np.allclose(np.asarray(old_cb), np.asarray(new_cb))
    assert np.asarray(updated["vq"]["quantizer"]["N"]).sum() > 0
    # eval mode must NOT touch vq state
    out2 = model.apply(variables, Xbd, Xtg, train=False)
    assert np.isfinite(float(out2["quant_diff"]))


def test_straight_through_gradients(model_and_vars):
    model, variables, Xbd, Xtg = model_and_vars
    params = variables["params"]
    Ytg = jnp.zeros((2, 256, 1))

    def loss_fn(p):
        out = model.apply({"params": p, "vq": variables["vq"]}, Xbd, Xtg)
        return vq_loss(out["logits"], Ytg, out["quant_diff"], beta=0.001)["loss"]

    grads = jax.grad(loss_fn)(params)
    g_enc = jax.tree_util.tree_leaves(grads["encoder"])
    # straight-through: encoder must receive gradient through the quantizer
    assert any(float(jnp.abs(g).sum()) > 0 for g in g_enc)
    g_dec = jax.tree_util.tree_leaves(grads["decoder"])
    assert any(float(jnp.abs(g).sum()) > 0 for g in g_dec)


def test_quantize_cloud_mode_fill(model_and_vars):
    model, variables, Xbd, _ = model_and_vars
    quant_ind, mode, encoded = model.apply(variables, Xbd,
                                           method=VQDIF.quantize_cloud)
    mask = np.asarray(encoded["grid_mask"])
    qi = np.asarray(quant_ind)
    assert (qi[~mask] == int(mode)).all()
    assert (qi[mask] == np.asarray(encoded["quant_ind"])[mask]).all()


def test_decode_index_and_chunked(model_and_vars):
    model, variables, Xbd, _ = model_and_vars
    r = GRID // 2
    rng = np.random.default_rng(1)
    code = jnp.asarray(rng.integers(0, VOCAB, (1, r, r, r)))
    Xtg = jnp.asarray(rng.uniform(-1, 1, (1, 512, 3)), jnp.float32)
    full = model.apply(variables, code, Xtg, method=VQDIF.decode_index)["logits"]
    chunked = model.apply(variables, code, Xtg, 128,
                          method=VQDIF.decode_index_chunked)["logits"]
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked),
                               rtol=1e-5, atol=1e-5)


def test_train_step_improves_loss(model_and_vars):
    model, variables, Xbd, Xtg = model_and_vars
    # occupancy target from a half-space: learnable signal
    Ytg = (np.asarray(Xtg)[..., 0:1] > 0).astype(np.float32)
    batch = dict(Xbd=Xbd, Xtg=Xtg, Ytg=jnp.asarray(Ytg))
    tx = optax.adam(1e-3)
    params, vq = variables["params"], variables["vq"]
    opt_state = tx.init(params)

    @jax.jit
    def step(params, vq, opt_state):
        def lf(p):
            return get_loss(model, {"params": p, "vq": vq}, batch, train=True)
        (loss, (losses, upd)), grads = jax.value_and_grad(lf, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), upd["vq"], opt_state, loss

    losses = []
    for _ in range(5):
        params, vq, opt_state, loss = step(params, vq, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_decode_index_grid_matches_chunked(rng):
    """Separable regular-grid decode == generic per-query decode on the same
    makeGrid queries (the meshing fast path)."""
    import jax
    import jax.numpy as jnp

    from shapeformer_tpu.models.vqdif.vqdif import VQDIF
    from shapeformer_tpu.utils.nputil import makeGrid

    vqdif = VQDIF(
        encoder_opt={"class": "shapeformer_tpu.models.vqdif.enc"
                              ".LocalPoolPointnet",
                     "kwargs": dict(c_dim=8, hidden_dim=8, grid_resolution=8,
                                    downsampler=False)},
        quantizer_opt={"class": "shapeformer_tpu.models.vqdif.quantizer"
                                ".Quantizer",
                       "kwargs": dict(vocab_size=16, n_embd=8)},
        decoder_opt={"class": "shapeformer_tpu.models.vqdif.dec.LocalDecoder",
                     "kwargs": dict(c_dim=8, hidden_size=8)})
    key = jax.random.PRNGKey(0)
    cloud = jax.random.uniform(key, (1, 128, 3), minval=-0.8, maxval=0.8)
    variables = vqdif.init(key, cloud, cloud[:, :32])
    code = jax.random.randint(key, (2, 8, 8, 8), 0, 16)
    R = 16
    Xtg = jnp.asarray(makeGrid([-1, -1, -1.0], [1.0, 1, 1], [R] * 3,
                               indexing="ij").astype(np.float32))
    Xtg = jnp.broadcast_to(Xtg[None], (2,) + Xtg.shape)
    want = vqdif.apply(variables, code, Xtg, R ** 3,
                       method=VQDIF.decode_index_chunked)["logits"]
    got = vqdif.apply(variables, code, R, method=VQDIF.decode_index_grid)["logits"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_sparse_downsampler_matches_dense(rng):
    """Downsampler.sparse_call (occupied rows + background constant through
    Conv->ReLU->GroupNorm) == __call__ on the densified grid — the
    tokenize-path optimization that skips the (B, 64^3, C) materialization."""
    import jax
    import jax.numpy as jnp

    from shapeformer_tpu.models.vqdif.updown import Downsampler

    B, r, C, n_occ, N = 2, 16, 8, 100, 256
    ds = Downsampler(in_channels=C, downsample_steps=2)
    key = jax.random.PRNGKey(0)
    vals = jnp.zeros((B, N, C))
    ids = jnp.full((B, N), r ** 3, jnp.int32)
    for b in range(B):
        cells = np.sort(rng.choice(r ** 3, n_occ, replace=False))
        ids = ids.at[b, :n_occ].set(jnp.asarray(cells, jnp.int32))
    vals = vals.at[:, :n_occ].set(jax.random.normal(key, (B, n_occ, C)))
    dense = jnp.zeros((B, r ** 3, C))
    for b in range(B):
        dense = dense.at[b, ids[b, :n_occ]].set(vals[b, :n_occ])
    dense = dense.reshape(B, r, r, r, C)
    variables = ds.init(key, dense)
    want = ds.apply(variables, dense)
    got = ds.apply(variables, vals, ids, r, method=Downsampler.sparse_call)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_sparse_downsampler_densify_at_matches_dense(rng):
    """sparse_call(densify_at=mid): one sparse step, then densify early and
    run the remaining steps as dense convs — must equal both the all-sparse
    and the dense path (the r5 grid-build lever: gather rows shrink 8x per
    early level, PERF.md row law)."""
    import jax
    import jax.numpy as jnp

    from shapeformer_tpu.models.vqdif.updown import Downsampler

    B, r, C, n_occ, N = 2, 16, 8, 100, 256
    ds = Downsampler(in_channels=C, downsample_steps=2)
    key = jax.random.PRNGKey(0)
    vals = jnp.zeros((B, N, C))
    ids = jnp.full((B, N), r ** 3, jnp.int32)
    for b in range(B):
        cells = np.sort(rng.choice(r ** 3, n_occ, replace=False))
        ids = ids.at[b, :n_occ].set(jnp.asarray(cells, jnp.int32))
    vals = vals.at[:, :n_occ].set(jax.random.normal(key, (B, n_occ, C)))
    dense = jnp.zeros((B, r ** 3, C))
    for b in range(B):
        dense = dense.at[b, ids[b, :n_occ]].set(vals[b, :n_occ])
    dense = dense.reshape(B, r, r, r, C)
    variables = ds.init(key, dense)
    want = ds.apply(variables, dense)
    got_mid = ds.apply(variables, vals, ids, r, 8,
                       method=Downsampler.sparse_call)   # densify at 8^3
    np.testing.assert_allclose(np.asarray(got_mid), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    # densify_at >= reso short-circuits to the pure dense path
    got_now = ds.apply(variables, vals, ids, r, r,
                       method=Downsampler.sparse_call)
    np.testing.assert_allclose(np.asarray(got_now), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_encoder_sparse_tokenize_matches_dense(rng):
    """LocalPoolPointnet(p, sparse=True) == the dense grid-build path, grid
    and mask both — so quantize_cloud's sparse_tokenize option is exact."""
    import jax
    import jax.numpy as jnp

    from shapeformer_tpu.models.vqdif.enc import LocalPoolPointnet

    enc = LocalPoolPointnet(
        c_dim=8, hidden_dim=8, grid_resolution=16, downsampler=True,
        downsampler_kwargs=dict(in_channels=8, downsample_steps=2))
    key = jax.random.PRNGKey(1)
    p = jax.random.uniform(key, (2, 500, 3), minval=-0.4, maxval=0.4)
    variables = enc.init(key, p)
    grid_d, mask_d = enc.apply(variables, p)
    grid_s, mask_s = enc.apply(variables, p, sparse=True)
    np.testing.assert_allclose(np.asarray(grid_s), np.asarray(grid_d),
                               rtol=1e-4, atol=1e-4)
    assert (np.asarray(mask_s) == np.asarray(mask_d)).all()


def test_quantize_cloud_sparse_tokenize_tokens_match(rng):
    """VQDIF.quantize_cloud with encoder.sparse_tokenize=True produces the
    same token grid + mode as the dense path on a well-separated codebook."""
    import jax

    from shapeformer_tpu.models.vqdif.vqdif import VQDIF

    def make(sparse):
        return VQDIF(
            encoder_opt={"class": "shapeformer_tpu.models.vqdif.enc"
                                  ".LocalPoolPointnet",
                         "kwargs": dict(c_dim=8, hidden_dim=8,
                                        grid_resolution=16, downsampler=True,
                                        sparse_tokenize=sparse,
                                        downsampler_kwargs=dict(
                                            in_channels=8,
                                            downsample_steps=1))},
            quantizer_opt={"class": "shapeformer_tpu.models.vqdif.quantizer"
                                    ".Quantizer",
                           "kwargs": dict(vocab_size=16, n_embd=16)},
            decoder_opt={"class": "shapeformer_tpu.models.vqdif.dec"
                                  ".LocalDecoder",
                         "kwargs": dict(c_dim=16, hidden_size=8)})

    key = jax.random.PRNGKey(2)
    cloud = jax.random.uniform(key, (2, 400, 3), minval=-0.8, maxval=0.8)
    vq_d, vq_s = make(False), make(True)
    variables = vq_d.init(key, cloud, cloud[:, :32])
    ind_d, mode_d, _ = vq_d.apply(variables, cloud,
                                  method=VQDIF.quantize_cloud)
    ind_s, mode_s, _ = vq_s.apply(variables, cloud,
                                  method=VQDIF.quantize_cloud)
    assert (np.asarray(ind_d) == np.asarray(ind_s)).all()
    assert (np.asarray(mode_d) == np.asarray(mode_s)).all()


def test_fused_tokenize_matches_two_calls(model_and_vars, rng):
    """quantize_clouds_fused (one sort/scatter/Downsampler at batch B*n via
    the encoder splits path) == n separate quantize_cloud calls: quant_ind
    and per-cloud mode exact, quant_feat allclose.  This is the SF training
    step's fused frozen-VQDIF tokenize (PERF.md training-path table)."""
    model, variables, _, _ = model_and_vars
    Xct = jnp.asarray(rng.uniform(-0.9, 0.9, (2, 96, 3)), jnp.float32)
    Xbd = jnp.asarray(rng.uniform(-0.9, 0.9, (2, 160, 3)), jnp.float32)

    fused = model.apply(variables, [Xct, Xbd],
                        method=VQDIF.quantize_clouds_fused)
    for cloud, (qi_f, mode_f, qf_f) in zip((Xct, Xbd), fused):
        qi, mode, encoded = model.apply(variables, cloud,
                                        method=VQDIF.quantize_cloud)
        assert int(mode_f) == int(mode)
        np.testing.assert_array_equal(np.asarray(qi_f), np.asarray(qi))
        np.testing.assert_allclose(np.asarray(qf_f),
                                   np.asarray(encoded["quant_feat"]),
                                   rtol=1e-5, atol=1e-5)


def test_encoder_splits_matches_separate_calls(rng):
    """The encoder splits path is exactly n separate encoder calls: feature
    grids allclose (same segments, same per-point math; only the dispatch is
    fused) and occupancy masks identical."""
    from shapeformer_tpu.models.vqdif.enc import LocalPoolPointnet

    enc = LocalPoolPointnet(c_dim=8, hidden_dim=8, plane_type="grid",
                            grid_resolution=8, downsampler=True,
                            downsampler_kwargs=dict(in_channels=8,
                                                    downsample_steps=1))
    a = jnp.asarray(rng.uniform(-0.45, 0.45, (3, 50, 3)), jnp.float32)
    b = jnp.asarray(rng.uniform(-0.45, 0.45, (3, 70, 3)), jnp.float32)
    variables = enc.init(jax.random.PRNGKey(1), a)

    grid_f, mask_f = enc.apply(variables, jnp.concatenate([a, b], axis=1),
                               splits=(50, 70))
    assert grid_f.shape[0] == 6
    for g, cloud in enumerate((a, b)):
        grid, mask = enc.apply(variables, cloud)
        # convs run at batch 2B in the fused call: XLA blocks/reassociates
        # them differently, so equality is reassociation-tolerance allclose
        np.testing.assert_allclose(np.asarray(grid_f[g::2]), np.asarray(grid),
                                   rtol=5e-3, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(mask_f[g::2]),
                                      np.asarray(mask))
