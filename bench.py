"""End-to-end completion benchmark on the real TPU chip.

Measures the reference's headline inference path (SURVEY.md section 6 /
BASELINE.md): one partial ShapeNet-scale cloud -> 8 candidate completions at
full flagship size (CondTupleGPT 20+4 layers, d=1024, block 812; VQDIF-16
with 4096x128 codebook; 512 AR steps max) -> 128^3 implicit decode of the
top-ranked candidate (the reference decodes all 8 only for visualization,
shapeformer.py:262-329) -> host marching tets, overlapped with the next
shape's device work.

Weights are randomly initialized — this is a throughput benchmark (the
reference repo publishes no quality numbers, BASELINE.md); random logits give
the worst-case sampler trajectory (the early-exit on all-candidates-done
almost never fires) and a worst-case noisy isosurface for the mesher.

Weights/activations run in bfloat16 (softmax, sampling logits and log-probs
stay float32 — ops/sampling.py casts at the boundary).

Prints ONE JSON line:
  {"metric": "shape_completion_s", "value": <steady-state s/shape>,
   "unit": "s", "vs_baseline": <north-star 1.0s / value>, "phases": {...}}
"""
import json
import sys
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/sftpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 4.0)

SAMPLE_N = 8
MAX_STEPS = 512
DECODE_RES = 128
TOP_K, TOP_P = 100, 0.4
PIPELINE_SHAPES = 9   # -> 8 completion gaps (first completion is the origin)
DTYPE = jnp.bfloat16
# int8 weight-only transformer serving path (ops/quant.py); SFTPU_BENCH_INT8=0
# falls back to bf16 weights
INT8 = __import__("os").environ.get("SFTPU_BENCH_INT8", "1") == "1"
# fp8 KV-cache storage halves the per-step cache stream; SFTPU_BENCH_FP8KV=0
# keeps the bf16 cache
CACHE_DTYPE = (jnp.float8_e4m3fn
               if __import__("os").environ.get("SFTPU_BENCH_FP8KV", "1") == "1"
               else jnp.bfloat16)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build():
    from shapeformer_tpu.models.shapeformer.shapeformer import ShapeFormer
    from shapeformer_tpu.models.vqdif.vqdif import VQDIF

    vqdif = VQDIF(
        encoder_opt={"class": "shapeformer_tpu.models.vqdif.enc"
                              ".LocalPoolPointnet",
                     "kwargs": dict(c_dim=32, hidden_dim=32,
                                    grid_resolution=64, downsampler=True,
                                    dtype=DTYPE,
                                    # frozen-tokenize path: segment-domain
                                    # level 0 + densify at 32^3 measured
                                    # 51.1 vs 73.7 ms dense at B8
                                    # Xbd32k+Xct16k (PERF.md); exact up to
                                    # float reassociation, no-grad path only
                                    sparse_tokenize=True,
                                    sparse_densify_at=32,
                                    downsampler_kwargs=dict(
                                        in_channels=32, downsample_steps=2))},
        quantizer_opt={"class": "shapeformer_tpu.models.vqdif.quantizer"
                                ".Quantizer",
                       "kwargs": dict(vocab_size=4096, n_embd=128)},
        decoder_opt={"class": "shapeformer_tpu.models.vqdif.dec.LocalDecoder",
                     "kwargs": dict(c_dim=32, hidden_size=32, unet3d=True,
                                    dtype=DTYPE,
                                    unet3d_kwargs=dict(num_levels=3,
                                                       f_maps=128,
                                                       in_channels=128,
                                                       out_channels=128),
                                    upsampler=True,
                                    upsampler_kwargs=dict(
                                        in_channels=128, upsampler_steps=2))},
        vq_beta=0.001)
    def make_sf(quant):
        return ShapeFormer(
            tuple_n=2, block_size=812, end_tokens=(4096, 4096),
            vocab_sizes=(4097, 4097), extra_vocab_sizes=(4097,), voxel_res=16,
            transformer_opt={"class": "shapeformer_tpu.models.shapeformer"
                                      ".transformer.mingpt.CondTupleGPT",
                             "kwargs": dict(tuple_n=2, vocab_sizes=(4097, 4097),
                                            extra_vocab_sizes=(4097,),
                                            block_size=812, n_layers=[20, 4],
                                            n_head=16, n_embd=1024, dtype=DTYPE,
                                            cache_dtype=CACHE_DTYPE,
                                            quant_dense=quant)},
            representer_opt={"class": "shapeformer_tpu.models.shapeformer"
                                      ".representers.AR_N",
                             "kwargs": dict(voxel_res=16, block_size=812,
                                            end_tokens=(4096, 4096),
                                            mask_invalid_completion=True)})
    return vqdif, make_sf(INT8), (make_sf(False) if INT8 else None)


def _cast_bf16(tree):
    return jax.tree_util.tree_map(
        lambda x: x.astype(DTYPE) if x.dtype == jnp.float32 else x, tree)


def _sync(out):
    """Force REAL completion: fetch one element of every output array.
    block_until_ready alone under-reports on the axon tunnel (a full 128^3
    decode 'completed' in 0.2 ms); a device_get cannot lie.  One BATCHED
    device_get: each separate fetch costs a full ~35 ms tunnel roundtrip
    (measured: 3 sequential 1-elem fetches 134 ms vs 49 ms batched), which
    used to dominate every phase number below."""
    jax.device_get([leaf.ravel()[0:1]
                    for leaf in jax.tree_util.tree_leaves(out)
                    if hasattr(leaf, "ravel")])
    return out


def _dispatch_constant_s(n=9):
    """Per-call tunnel/dispatch constant: median time of a trivial jitted
    program measured exactly like every phase below (enqueue + one batched
    1-elem device_get).  On-device this program is ~1 us, so the whole
    measurement is transport overhead; phase numbers report it separately so
    device work isn't conflated with the axon tunnel (a local-host TPU pays
    ~0.1 ms here)."""
    one = jnp.ones((8, 8))
    triv = jax.jit(lambda x: x + 1.0)
    ts = []
    _sync(triv(one))
    for _ in range(n):
        t0 = time.time()
        _sync(triv(one))
        ts.append(time.time() - t0)
    return float(np.median(ts))


def _median_time(fn, n=3):
    times = []
    for _ in range(n):
        t0 = time.time()
        _sync(fn())
        times.append(time.time() - t0)
    return float(np.median(times)), times


def bench_scatter():
    """Microbenchmark of the encoder pooling kernels (VERDICT r1 task 3):
    XLA scatter (segment_max+gather) vs sort+segmented-scan (pooled_gather)
    vs the Pallas scan core, at training shapes (B8 x 16k pts x C32, 64^3)."""
    from shapeformer_tpu.ops import scatter

    B, N, C, reso = 8, 16384, 32, 64
    key = jax.random.PRNGKey(0)
    c = jax.random.normal(key, (B, N, C), jnp.float32)
    ids = jax.random.randint(key, (B, N), 0, reso ** 3)
    plan = jax.jit(scatter.pool_plan)(ids)

    def xla_scatter(c, ids):
        return scatter.gather_cells(
            scatter.scatter_max(c, ids, reso ** 3), ids)

    cb = c.astype(jnp.bfloat16)
    variants = {
        "xla-scatter": jax.jit(xla_scatter),
        "sort+scan": jax.jit(lambda c, p: scatter.pooled_gather(
            c, p, "max", use_pallas=False)),
        "pallas-scan": jax.jit(lambda c, p: scatter.pooled_gather(
            c, p, "max", use_pallas=True)),
        # the round-4 default: packed-cummax / cumsum formulation (bf16,
        # the encoder's on-TPU dtype), incl. the perm/inv_perm gathers the
        # sorted-order encoder itself skips
        "cumsum-sorted(bf16)": jax.jit(lambda c, p: scatter.pooled_gather(
            cb, p, "max")),
    }
    results = {}
    for name, fn in variants.items():
        arg = ids if name == "xla-scatter" else plan
        try:
            jax.block_until_ready(fn(c, arg))     # compile
            t, _ = _median_time(lambda: fn(c, arg), n=5)
            results[name] = t
        except Exception as e:                     # pallas may lack TPU support
            log(f"scatter[{name}]: failed ({type(e).__name__}: {e})")
            results[name] = None
    line = " | ".join(f"{k} {v*1e3:.2f}ms" if v else f"{k} n/a"
                      for k, v in results.items())
    log(f"scatter pool+gather (B{B} N{N} C{C} grid {reso}^3): {line}")
    log("encoder pooling default: sorted-order cumsum/packed-cummax "
        "(ops/scatter.pooled_sorted)")
    return results


def bench_train():
    """Training-path benchmark (VERDICT r3 #1): flagship ShapeFormer train
    step (325M params, block 812, the real loss path incl. the frozen-VQDIF
    tokenization of Xct 16384 + Xbd 32768 per row) and the VQDIF train step
    at the reference's batch 8 (configs/vqdif/shapenet_res16.yaml:14,
    boundary_N 32768 / target_N 8192).  bf16 compute with f32 master weights
    (flax param_dtype default).  Reports step time, tokens/s and analytic
    matmul MFU vs the v5e bf16 peak.  Batch 8 for the transformer too — the
    reference's batch 1 (shapenet_scale.yaml:14) underfills the chip; the
    per-step weight stream amortizes across rows.
    Opt out with SFTPU_BENCH_TRAIN=0."""
    import optax
    from shapeformer_tpu.systems import ShapeFormerSystem, VQDIFSystem

    V5E_BF16_PEAK = 197e12
    B, T = 8, 812
    vqdif, sf_q, sf_f = build()
    sf = sf_f if sf_f is not None else sf_q   # float weights for training
    rng = jax.random.PRNGKey(0)
    cloud = jax.random.uniform(rng, (1, 32768, 3), minval=-0.8, maxval=0.8)
    vq_vars = jax.jit(lambda r, c: vqdif.init(r, c, c[:, :4096]))(rng, cloud)
    sf.representer.set_vqdif(vqdif, vq_vars)

    def steps_per_s(system, state, batch, rng_arg, n=6):
        args = (jax.random.PRNGKey(3),) if rng_arg else ()
        state, m = system.train_step(state, batch, *args)   # compile
        _sync(m)
        for _ in range(2):
            state, m = system.train_step(state, batch, *args)
        _sync(m)
        t0 = time.time()
        for _ in range(n):
            state, m = system.train_step(state, batch, *args)
        _sync(m)
        return (time.time() - t0) / n

    # --- flagship ShapeFormer train step (bf16 path of build()) ---
    sf_sys = ShapeFormerSystem.__new__(ShapeFormerSystem)
    sf_sys.model, sf_sys.mesh = sf, None
    sf_sys._lr = lambda s: 1e-5
    sf_sys.tx = optax.adamw(1e-5, b1=0.9, b2=0.95, weight_decay=0.01,
                            mask=ShapeFormerSystem._decay_mask)
    sf_sys._train_step = jax.jit(sf_sys._train_step_impl, donate_argnums=(0,))
    params = sf.init_variables(jax.random.PRNGKey(1))
    n_mat = sum(int(np.prod(l.shape)) for p, l in
                jax.tree_util.tree_leaves_with_path(params)
                if getattr(p[-1], "key", getattr(p[-1], "name", "")) ==
                "kernel")
    state = dict(params=params, opt_state=sf_sys.tx.init(params["params"]),
                 step=jnp.int32(0))
    batch = dict(Xct=jnp.tile(cloud[:, :16384], (B, 1, 1)),
                 Xbd=jnp.tile(cloud, (B, 1, 1)))
    t0 = time.time()
    sf_step_s = steps_per_s(sf_sys, state, batch, rng_arg=True)
    flops = 6 * n_mat * B * T + 12 * 24 * B * T * T * 1024
    sf_mfu = flops / sf_step_s / V5E_BF16_PEAK
    log(f"train SF (B{B}, tokenize+fwd+bwd+adamw): {sf_step_s*1e3:.1f} "
        f"ms/step  {B*T/sf_step_s:.0f} tok/s  MFU {sf_mfu*100:.1f}% "
        f"(bench total {time.time()-t0:.0f}s)")

    # --- VQDIF train step at reference batch 8 ---
    vq_sys = VQDIFSystem.__new__(VQDIFSystem)
    vq_sys.model, vq_sys.mesh = vqdif, None
    vq_sys.hyper_parameters = {}
    vq_sys._lr = lambda s: 1e-4
    vq_sys.tx = optax.adam(1e-4)
    vq_sys._train_step = jax.jit(vq_sys._train_step_impl, donate_argnums=(0,))
    vbatch = dict(
        Xbd=jax.random.uniform(rng, (B, 32768, 3), minval=-0.8, maxval=0.8),
        Xtg=jax.random.uniform(rng, (B, 8192, 3), minval=-1, maxval=1),
        Ytg=(jax.random.uniform(rng, (B, 8192, 1)) > 0.5
             ).astype(jnp.float32))
    variables = jax.jit(lambda r: vqdif.init(r, vbatch["Xbd"][:1],
                                             vbatch["Xtg"][:1]))(rng)
    vstate = dict(params=variables["params"], vq=variables["vq"],
                  opt_state=vq_sys.tx.init(variables["params"]),
                  step=jnp.int32(0))
    # XLA-counted executed flops of the compiled step (the model is
    # conv+gather heterogeneous, so no clean analytic formula exists);
    # lower() before the run — donation deletes the state buffers
    try:
        ca = vq_sys._train_step.lower(vstate, vbatch).compile(
            ).cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        vq_flops = float(ca.get("flops", 0.0))
    except Exception as e:                                 # pragma: no cover
        log(f"vqdif cost_analysis failed: {type(e).__name__}: {e}")
        vq_flops = 0.0
    vq_step_s = steps_per_s(vq_sys, vstate, vbatch, rng_arg=False)
    vq_mfu = vq_flops / vq_step_s / V5E_BF16_PEAK
    log(f"train VQDIF (B{B}, 32768 pts / 8192 targets): "
        f"{vq_step_s*1e3:.1f} ms/step  {B/vq_step_s:.1f} shapes/s  "
        f"MFU {vq_mfu*100:.1f}% (XLA-counted {vq_flops/1e12:.2f} TF/step)")

    # --- grid-build ablation: duplicate-index scatter-add vs sorted unique
    # stores (the round-4 encoder optimization; ops/scatter.py) ---
    from shapeformer_tpu.ops import scatter
    key = jax.random.PRNGKey(5)
    c = jax.random.normal(key, (B, 49152, 32), jnp.bfloat16)
    ids = jax.random.randint(key, (B, 49152), 0, 64 ** 3)
    plan = jax.jit(scatter.pool_plan)(ids)
    old = jax.jit(lambda c, i: scatter.scatter_mean(c, i, 64 ** 3))
    new = jax.jit(lambda c, i, p: scatter.scatter_mean_plan(c, i, p,
                                                            64 ** 3))
    jax.block_until_ready(old(c, ids)); jax.block_until_ready(new(c, ids, plan))
    t_old, _ = _median_time(lambda: old(c, ids), n=3)
    t_new, _ = _median_time(lambda: new(c, ids, plan), n=3)
    log(f"grid build (B8 x 49k pts -> 64^3): scatter-add {t_old*1e3:.1f} ms "
        f"-> pointer-store+gather {t_new*1e3:.1f} ms")
    return {"sf_train_step_s": round(sf_step_s, 4),
            "sf_tokens_per_s": round(B * T / sf_step_s, 1),
            "sf_train_mfu": round(sf_mfu, 4),
            "vqdif_train_step_s": round(vq_step_s, 4),
            "vqdif_mfu": round(vq_mfu, 4),
            "grid_build_scatter_ms": round(t_old * 1e3, 2),
            "grid_build_gather_ms": round(t_new * 1e3, 2)}


def bench_res256():
    """Full-res (res32 / 256^3) runtime proof (VERDICT r4 missing #2):
    the SHIPPED configs/vqdif/shapenet_res32.yaml model (64^3 -> 32^3 VQ,
    64-dim codes) tokenizes a 32k cloud and decodes a real token grid at
    256^3 = 16.7M queries through BOTH big-query paths (decode_index_chunked
    lax.map tiles / decode_index_grid separable interp); plus tokenize at
    128^3 and 256^3 FINE grids, sparse-direct vs dense downsampler — the
    regime PERF.md predicts the sparse formulation wins (the dense path must
    materialize the (B, R^3, C) grid; the sparse path feeds occupied rows
    only).  Opt out with SFTPU_BENCH_RES256=0."""
    import os as _os

    from shapeformer_tpu import config as _config
    from shapeformer_tpu.models.vqdif.enc import LocalPoolPointnet
    from shapeformer_tpu.models.vqdif.vqdif import VQDIF

    repo = _os.path.dirname(_os.path.abspath(__file__))
    opt = _config.get_opt(_os.path.join(repo, "configs/vqdif/"
                                        "shapenet_res32.yaml"), root_dir=repo)
    kw = opt["pl_model_opt"]["kwargs"]
    for comp in ("encoder_opt", "decoder_opt"):
        kw[comp]["kwargs"]["dtype"] = DTYPE
    model = _config.instantiate_from_opt(opt["pl_model_opt"])
    rng = jax.random.PRNGKey(0)
    cloud = jax.random.uniform(rng, (1, 32768, 3), minval=-0.8, maxval=0.8)
    variables = jax.jit(lambda r, c: model.init(r, c, c[:, :4096]))(rng, cloud)
    disp_s = _dispatch_constant_s()
    out = {}

    j_tok = jax.jit(lambda v, c: model.apply(v, c,
                                             method=VQDIF.quantize_cloud))
    quant_ind, _, _ = _sync(j_tok(variables, cloud))
    tok_s, _ = _median_time(lambda: j_tok(variables, cloud))
    out["res32_tokenize_ms"] = round((tok_s - disp_s) * 1e3, 2)
    log(f"res32 tokenize (32k pts -> 32^3 VQ grid): "
        f"{out['res32_tokenize_ms']:.1f} ms net")

    # ---- 256^3 decode of the REAL token grid, both big-query paths ----
    R = 256
    ax = np.linspace(-1.0, 1.0, R).astype(np.float32)
    g = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), -1).reshape(1, -1, 3)
    Xq = jnp.asarray(g)
    j_chunk = jax.jit(lambda v, c, X: model.apply(
        v, c, X, 262144, method=VQDIF.decode_index_chunked))
    j_grid = jax.jit(lambda v, c: model.apply(
        v, c, R, method=VQDIF.decode_index_grid))
    t0 = time.time()
    lg_c = _sync(j_chunk(variables, quant_ind, Xq))["logits"]
    log(f"  256^3 chunked decode compile+run: {time.time()-t0:.1f}s")
    t0 = time.time()
    lg_g = _sync(j_grid(variables, quant_ind))["logits"]
    log(f"  256^3 grid decode compile+run: {time.time()-t0:.1f}s")
    agree = float(jnp.mean(jnp.abs(lg_c - lg_g)))
    chunk_s, _ = _median_time(lambda: j_chunk(variables, quant_ind, Xq))
    grid_s, _ = _median_time(lambda: j_grid(variables, quant_ind))
    out["decode256_chunked_s"] = round(max(chunk_s - disp_s, 0.0), 4)
    out["decode256_grid_s"] = round(max(grid_s - disp_s, 0.0), 4)
    log(f"res32 decode at 256^3 (16.7M queries): chunked "
        f"{out['decode256_chunked_s']:.3f}s | separable-grid "
        f"{out['decode256_grid_s']:.3f}s (paths agree to {agree:.2e} "
        f"mean |dlogit|)")

    # ---- tokenize at large fine grids: sparse-direct vs dense ----
    for reso, steps in ((128, 2), (256, 3)):
        enc = LocalPoolPointnet(
            c_dim=32, hidden_dim=32, plane_type="grid", grid_resolution=reso,
            downsampler=True, dtype=DTYPE,
            downsampler_kwargs=dict(in_channels=32, downsample_steps=steps))
        pts = cloud[0:1] / 2.0
        evars = jax.jit(enc.init)(rng, pts)
        j_dense = jax.jit(lambda v, p: enc.apply(v, p))
        j_sparse = jax.jit(lambda v, p: enc.apply(v, p, sparse=True))
        _sync(j_dense(evars, pts))
        _sync(j_sparse(evars, pts))
        d_s, _ = _median_time(lambda: j_dense(evars, pts))
        s_s, _ = _median_time(lambda: j_sparse(evars, pts))
        # net-of-dispatch; clamp at 0 — at the few-ms scale the tunnel
        # constant's run-to-run jitter can exceed the device time itself
        out[f"tokenize{reso}_dense_ms"] = round(max((d_s - disp_s) * 1e3, 0.0), 2)
        out[f"tokenize{reso}_sparse_ms"] = round(max((s_s - disp_s) * 1e3, 0.0), 2)
        log(f"tokenize at {reso}^3 fine grid (32k pts, B1): dense "
            f"{out[f'tokenize{reso}_dense_ms']:.1f} ms | sparse-direct "
            f"{out[f'tokenize{reso}_sparse_ms']:.1f} ms")
    return out


def main():
    from shapeformer_tpu.ops import sparse as sparse_ops
    from shapeformer_tpu.models.vqdif.vqdif import VQDIF
    from shapeformer_tpu.utils import geoutil
    from shapeformer_tpu.utils.nputil import makeGrid

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")
    bench_scatter()
    train_metrics = {}
    if __import__("os").environ.get("SFTPU_BENCH_TRAIN", "1") == "1":
        train_metrics = bench_train()
    res256_metrics = {}
    if __import__("os").environ.get("SFTPU_BENCH_RES256", "1") == "1":
        try:
            res256_metrics = bench_res256()
        except Exception as e:   # never let the extra section kill the
            log(f"bench_res256 failed: {type(e).__name__}: {e}")  # headline
            res256_metrics = {"error": f"{type(e).__name__}: {e}"}
    vqdif, sf, sf_float = build()

    rng = jax.random.PRNGKey(0)
    cloud = jax.random.uniform(rng, (1, 16384, 3), minval=-0.8, maxval=0.8)
    t0 = time.time()
    vq_vars = jax.jit(lambda r, c: vqdif.init(r, c, c[:, :4096]))(rng, cloud)
    # bf16 weights, f32 'vq' EMA/codebook state (quantizer math is f32)
    vq_vars = {"params": _cast_bf16(vq_vars["params"]),
               **{k: v for k, v in vq_vars.items() if k != "params"}}
    sf.representer.set_vqdif(vqdif, vq_vars)
    if INT8:
        from shapeformer_tpu.ops.quant import quantize_tree
        sf_float.representer.set_vqdif(vqdif, vq_vars)
        fparams = sf_float.init_variables(jax.random.PRNGKey(1))
        params = {"params": quantize_tree(fparams["params"])}
        wbits = "int8 kernels"
    else:
        params = _cast_bf16(sf.init_variables(jax.random.PRNGKey(1)))
        wbits = "bf16"
    n_params = sum(np.prod(x.shape) for x in
                   jax.tree_util.tree_leaves(params))
    log(f"transformer params: {n_params/1e6:.1f}M ({wbits}) "
        f"(init {time.time()-t0:.1f}s)")

    rep = sf.representer
    all_Xtg = jnp.asarray(makeGrid([-1, -1, -1.0], [1.0, 1, 1],
                                   [DECODE_RES] * 3,
                                   indexing="ij").astype(np.float32))

    def sample_fn(params, vq_vars, Xct, key, max_steps):
        """Encode partial cloud, sample SAMPLE_N candidates (KV-cached AR;
        the condition prefills ONCE and its caches are tiled)."""
        c, _, _, others = rep.get_indices(Xct=Xct, stage="test",
                                          vqdif_vars=vq_vars)
        out, _, logp = sf.sample(params, c, key, max_steps=max_steps,
                                 top_k=TOP_K, top_p=TOP_P, best_in_first=True,
                                 candidates=SAMPLE_N)
        return out, logp, others["empty_index"]

    def decode_best(vq_vars, out, empty_index, logp):
        """128^3 implicit decode of only the top-ranked candidate, through
        the separable regular-grid path (decode_index_grid: MXU interp
        matmuls instead of per-query gathers — 10x over the generic path).
        Returns occupancy as uint8 (sigmoid * 255): the host fetch of the
        2.1M-voxel grid is 4x cheaper than f32 (0.35 s -> ~0.1 s over the
        tunnel) and 1/255 iso-interpolation resolution is far below the
        mesher's vertex-placement noise."""
        dense = sparse_ops.sparse2dense(out, empty_index, 16)
        best = jnp.argmax(logp)
        d = jax.lax.dynamic_index_in_dim(dense, best, axis=0, keepdims=True)
        logits = vqdif.apply(vq_vars, d, DECODE_RES,
                             method=VQDIF.decode_index_grid)["logits"]
        occ = jax.nn.sigmoid(logits[0, :, 0].astype(jnp.float32))
        return jnp.round(occ * 255.0).astype(jnp.uint8)

    jit_sample = jax.jit(lambda p, v, x, k: sample_fn(p, v, x, k, MAX_STEPS))
    jit_probe = jax.jit(lambda p, v, x, k: sample_fn(p, v, x, k, 1))
    jit_decode = jax.jit(decode_best)

    Xct = cloud[:, :8192]
    log("compiling (sample / probe / decode)...")
    t0 = time.time()
    out, logp, empt = jax.block_until_ready(
        jit_sample(params, vq_vars, Xct, jax.random.PRNGKey(2)))
    log(f"  sample compile+run: {time.time()-t0:.1f}s; gen tokens cand0: "
        f"{int((np.asarray(out)[0, :, 0] != 4096).sum())}")
    t0 = time.time()
    jax.block_until_ready(jit_probe(params, vq_vars, Xct, jax.random.PRNGKey(2)))
    log(f"  probe compile+run: {time.time()-t0:.1f}s")
    t0 = time.time()
    occ = jax.block_until_ready(jit_decode(vq_vars, out, empt, logp))
    log(f"  decode compile+run: {time.time()-t0:.1f}s")

    # ---------------------------------------------------------------- phases
    disp_s = _dispatch_constant_s()
    log(f"dispatch/tunnel constant: {disp_s*1e3:.1f} ms per jitted call "
        f"(subtracted in *_net phase numbers)")
    probe_s, _ = _median_time(
        lambda: jit_probe(params, vq_vars, Xct, jax.random.PRNGKey(3)))
    sample_s, sample_ts = _median_time(
        lambda: jit_sample(params, vq_vars, Xct, jax.random.PRNGKey(3)))
    decode_s, _ = _median_time(lambda: jit_decode(vq_vars, out, empt, logp))
    occ_np = (np.asarray(occ).astype(np.float32) / 255.0).reshape(
        DECODE_RES, DECODE_RES, DECODE_RES)
    mesh_ts = []
    for _ in range(6):
        t0 = time.time()
        vert, face = geoutil.array2mesh(occ_np.reshape(-1), thresh=0.5,
                                        coords=np.asarray(all_Xtg))
        mesh_ts.append(time.time() - t0)
    # the first runs pay one-time costs (extractor .so dlopen, allocator
    # growth to ~1M-face arrays, cold page cache) that no steady-state shape
    # pays — drop them from the estimate
    mesh_s = float(np.median(mesh_ts[2:]))
    log(f"mesh times: {[round(t, 3) for t in mesh_ts]} "
        f"(median of warm runs {mesh_s:.3f}s)")
    ar_s = max(sample_s - probe_s, 0.0)
    latency_s = sample_s + decode_s + mesh_s
    # net = device work only (the probe program's own trace shows ~5 ms of
    # device time; the rest of the raw number is the per-call tunnel cost
    # that a sequential phase measurement pays but the single fused sample
    # program pays only once)
    probe_net_s = max(probe_s - disp_s, 0.0)
    decode_net_s = max(decode_s - disp_s, 0.0)
    log(f"phases: tokenize+prefill {probe_s:.3f}s (net {probe_net_s:.3f}) | "
        f"AR loop ({MAX_STEPS} steps x {SAMPLE_N} cand) {ar_s:.3f}s | "
        f"decode 128^3 top-1 {decode_s:.3f}s (net {decode_net_s:.3f}) | "
        f"mesh {mesh_s:.3f}s ({len(vert)} verts, {len(face)} faces)")
    log(f"sequential latency: {latency_s:.3f}s  (sample times "
        f"{[round(t, 3) for t in sample_ts]})")
    # Per-step breakdown from the on-TPU v5e trace of the jitted loop (cache
    # redesign, commit d4d54a4): mandatory int8 weight stream ~0.40 ms +
    # fp8 KV-cache read ~0.26 ms; the rest is fusion-dispatch overhead
    # (~8 us/fusion, ~48 LayerNorms alone ~0.38 ms).  Pallas in-loop was
    # measured and rejected (layout copies at the kernel boundary).
    log(f"AR step: {ar_s / MAX_STEPS * 1e3:.2f} ms/step x {SAMPLE_N} cand "
        f"(HBM floor ~0.66 ms: int8 weights 0.40 + fp8 KV 0.26; "
        f"remainder is fusion dispatch)")

    # ------------------------------------- steady-state pipelined throughput
    # Host meshing of shape i overlaps device work of shape i+1 (the mesher
    # releases the GIL inside the ctypes call).
    mesh_thread = None
    mesh_stats = []   # per-shape (mesh_s, n_verts, n_faces), worker-appended

    def mesh_job(o, record=False):
        t0 = time.time()
        vert, face = geoutil.array2mesh(
            o.astype(np.float32).reshape(-1) / 255.0, thresh=0.5,
            coords=np.asarray(all_Xtg))
        if record:
            mesh_stats.append((time.time() - t0, len(vert), len(face)))

    def launch(i):
        """Enqueue sample+decode for shape i (async jax dispatch)."""
        o, lp, em = jit_sample(params, vq_vars, Xct, jax.random.PRNGKey(100 + i))
        return jit_decode(vq_vars, o, em, lp)

    # Per-shape completion intervals; the single host core's speed swings
    # several-fold with machine noise, so the steady-state estimate is the
    # MEDIAN interval, not the mean.  Two untimed warmup shapes FILL the
    # pipeline before the window: the first post-compile sample pays
    # one-time allocator/donation costs, the mesher's first runs pay
    # dlopen/page-cache costs, and until one shape is in flight there is
    # no device/host overlap — none of which a steady-state shape repays.
    warm0 = launch(-2)
    warm1 = launch(-1)
    mesh_job(np.asarray(warm0))          # device computes -1 meanwhile
    occ_w = np.asarray(warm1)
    occ_fut = launch(0)
    mesh_job(occ_w)                      # device computes 0 meanwhile
    done_t = []
    dev_wait = []   # per-shape host time blocked on the device fetch
    for i in range(PIPELINE_SHAPES):
        nxt = launch(i + 1) if i + 1 < PIPELINE_SHAPES else None
        t0 = time.time()
        occ_i = np.asarray(occ_fut)    # blocks; device already runs shape i+1
        dev_wait.append(time.time() - t0)
        occ_fut = nxt
        if mesh_thread is not None:
            mesh_thread.join()
            done_t.append(time.time())
        mesh_thread = threading.Thread(target=mesh_job, args=(occ_i, True))
        mesh_thread.start()
    mesh_thread.join()
    done_t.append(time.time())
    # steady-state = gaps BETWEEN completions, with the first completion as
    # the origin: the gap t0 -> first completion would measure pipeline
    # build-up (plus the tunnel's consistent +0.3 s first-dispatch-after-a-
    # pause cost), which no steady-state shape repays
    intervals = np.diff(done_t)
    steady_s = float(np.median(intervals))
    max_interval_s = float(np.max(intervals))
    log(f"pipelined completion gaps over {PIPELINE_SHAPES} shapes "
        f"(first completion = origin): {[round(t, 3) for t in intervals]} "
        f"-> median {steady_s:.3f}s/shape (max {max_interval_s:.3f}s)")
    # gap attribution (VERDICT r4 weak #3): the gap ending at shape k's
    # completion spans mesh(k) on the worker thread overlapped with the
    # host's blocked fetch of shape k+1's occupancy — so each gap ~
    # max(mesh_s[k], dev_wait[k+1]) and outliers are explained by whichever
    # term spikes (mesh time scales with the extracted surface size)
    for i, gap in enumerate(intervals):
        k = i + 1                       # gap i ends at shape k's completion
        dw = dev_wait[k + 1] if k + 1 < len(dev_wait) else float("nan")
        ms, nv, nf = mesh_stats[k] if k < len(mesh_stats) else (
            float("nan"),) * 3
        log(f"  gap {i}: {gap:.3f}s ~ max(mesh {ms:.3f}s "
            f"[{nv} verts, {nf} faces], device-wait {dw:.3f}s)")

    # ------------------------------- batched-shapes serving throughput extra
    # ShapeFormer.complete_many: S shapes per sampling call amortizes the
    # per-step weight stream S-fold (the reference completes one shape at a
    # time); this is the framework's high-throughput serving mode.
    def sample_batched(params, vq_vars, Xcts, key):
        res = sf.complete_many(params, Xcts, key, vqdif_vars=vq_vars,
                               candidates=SAMPLE_N, max_steps=MAX_STEPS,
                               top_k=TOP_K, top_p=TOP_P)
        return res["tokens"], res["log_prob"], res["empty_index"]

    jit_batched = jax.jit(sample_batched)
    batched_per_shape = {}
    # r3 plateau (tiled caches): 0.436/0.379/0.352 s/shape at S=4/8/16 —
    # the split-cond cache (mingpt.decode_split) reads the condition segment
    # once per condition instead of per candidate row, so scaling past S~8
    # is no longer capped by duplicated cond-KV streams
    for S in (8, 16):
        Xcts = jnp.concatenate([Xct] * S, axis=0)
        t0 = time.time()
        jax.block_until_ready(jit_batched(params, vq_vars, Xcts,
                                          jax.random.PRNGKey(7)))
        log(f"  batched S={S} compile+run: {time.time()-t0:.1f}s")
        batched_s, _ = _median_time(
            lambda: jit_batched(params, vq_vars, Xcts, jax.random.PRNGKey(8)))
        batched_per_shape[S] = batched_s / S
        log(f"batched serving: {S} shapes x {SAMPLE_N} candidates per call "
            f"-> {batched_s:.3f}s = {batched_s / S:.3f}s/shape AR+prefill")

    result = {"metric": "shape_completion_s", "value": round(steady_s, 4),
              "unit": "s", "vs_baseline": round(1.0 / steady_s, 3),
              "phases": {"tokenize_prefill_s": round(probe_s, 4),
                         "tokenize_prefill_net_s": round(probe_net_s, 4),
                         "dispatch_roundtrip_s": round(disp_s, 4),
                         "ar_loop_s": round(ar_s, 4),
                         "decode_s": round(decode_s, 4),
                         "decode_net_s": round(decode_net_s, 4),
                         "mesh_s": round(mesh_s, 4),
                         "max_interval_s": round(max_interval_s, 4),
                         "sequential_latency_s": round(latency_s, 4),
                         **{f"batched{s}_sample_s_per_shape": round(v, 4)
                            for s, v in batched_per_shape.items()}},
              "train": train_metrics, "res256": res256_metrics}
    print(json.dumps(result))


if __name__ == "__main__":
    main()
