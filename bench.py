"""End-to-end completion benchmark on the real TPU chip.

Measures the reference's headline inference path (SURVEY.md section 6 /
BASELINE.md): one partial ShapeNet-scale cloud -> 8 candidate completions at
full flagship size (CondTupleGPT 20+4 layers, d=1024, block 812; VQDIF-16
with 4096x128 codebook; 512 AR steps max; 128^3 implicit decode per
candidate) -> host marching cubes on the best candidate.

Weights are randomly initialized — this is a throughput benchmark (the
reference repo publishes no quality numbers, BASELINE.md); random logits give
the worst-case sampler trajectory (the early-exit on all-candidates-done
almost never fires).

Prints ONE JSON line:
  {"metric": "shape_completion_s", "value": <s/shape>, "unit": "s",
   "vs_baseline": <north-star 1.0s / value>}
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_N = 8
MAX_STEPS = 512
DECODE_RES = 128
TOP_K, TOP_P = 100, 0.4


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
                                    downsampler_kwargs=dict(
                                        in_channels=32, downsample_steps=2))},
        quantizer_opt={"class": "shapeformer_tpu.models.vqdif.quantizer"
                                ".Quantizer",
                       "kwargs": dict(vocab_size=4096, n_embd=128)},
        decoder_opt={"class": "shapeformer_tpu.models.vqdif.dec.LocalDecoder",
                     "kwargs": dict(c_dim=32, hidden_size=32, unet3d=True,
                                    unet3d_kwargs=dict(num_levels=3,
                                                       f_maps=128,
                                                       in_channels=128,
                                                       out_channels=128),
                                    upsampler=True,
                                    upsampler_kwargs=dict(
                                        in_channels=128, upsampler_steps=2))},
        vq_beta=0.001)
    sf = ShapeFormer(
        tuple_n=2, block_size=812, end_tokens=(4096, 4096),
        vocab_sizes=(4097, 4097), extra_vocab_sizes=(4097,), voxel_res=16,
        transformer_opt={"class": "shapeformer_tpu.models.shapeformer"
                                  ".transformer.mingpt.CondTupleGPT",
                         "kwargs": dict(tuple_n=2, vocab_sizes=(4097, 4097),
                                        extra_vocab_sizes=(4097,),
                                        block_size=812, n_layers=[20, 4],
                                        n_head=16, n_embd=1024)},
        representer_opt={"class": "shapeformer_tpu.models.shapeformer"
                                  ".representers.AR_N",
                         "kwargs": dict(voxel_res=16, block_size=812,
                                        end_tokens=(4096, 4096),
                                        mask_invalid_completion=True)})
    return vqdif, sf


def main():
    from shapeformer_tpu.ops import sparse as sparse_ops
    from shapeformer_tpu.models.vqdif.vqdif import VQDIF
    from shapeformer_tpu.utils import geoutil
    from shapeformer_tpu.utils.nputil import makeGrid, sigmoid

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")
    vqdif, sf = build()

    rng = jax.random.PRNGKey(0)
    cloud = jax.random.uniform(rng, (1, 16384, 3), minval=-0.8, maxval=0.8)
    t0 = time.time()
    vq_vars = jax.jit(lambda r, c: vqdif.init(r, c, c[:, :4096]))(rng, cloud)
    sf.representer.set_vqdif(vqdif, vq_vars)
    params = sf.init_variables(jax.random.PRNGKey(1))
    n_params = sum(np.prod(x.shape) for x in
                   jax.tree_util.tree_leaves(params))
    log(f"transformer params: {n_params/1e6:.1f}M  (init {time.time()-t0:.1f}s)")

    rep = sf.representer
    all_Xtg = jnp.asarray(makeGrid([-1, -1, -1.0], [1.0, 1, 1],
                                   [DECODE_RES] * 3,
                                   indexing="ij").astype(np.float32))

    def complete(params, vq_vars, Xct, key):
        """Full completion: encode -> sample 8 candidates -> decode 128^3."""
        c, _, _, others = rep.get_indices(Xct=Xct, stage="test",
                                          vqdif_vars=vq_vars)
        c_exp = jnp.broadcast_to(c, (SAMPLE_N,) + c.shape[1:])
        out, _, logp = sf.sample(params, c_exp, key, max_steps=MAX_STEPS,
                                 top_k=TOP_K, top_p=TOP_P, best_in_first=True)
        dense = sparse_ops.sparse2dense(out, others["empty_index"], 16)
        Xtg = jnp.broadcast_to(all_Xtg[None],
                               (SAMPLE_N,) + all_Xtg.shape)
        logits = vqdif.apply(vq_vars, dense, Xtg, 131072,
                             method=VQDIF.decode_index_chunked)["logits"]
        return logits, logp, out

    jitted = jax.jit(complete)
    log("compiling...")
    t0 = time.time()
    logits, logp, toks = jax.block_until_ready(
        jitted(params, vq_vars, cloud[:, :8192], jax.random.PRNGKey(2)))
    compile_s = time.time() - t0
    log(f"compile+first run: {compile_s:.1f}s; "
        f"gen tokens cand0: {int((np.asarray(toks)[0, :, 0] != 4096).sum())}")

    times = []
    for i in range(3):
        key = jax.random.PRNGKey(10 + i)
        t0 = time.time()
        logits, logp, toks = jax.block_until_ready(
            jitted(params, vq_vars, cloud[:, :8192], key))
        times.append(time.time() - t0)
    device_s = float(np.median(times))
    log(f"device completion times: {[round(t, 3) for t in times]}")

    # host meshing of the best candidate (part of the end-to-end path)
    best = int(np.argmax(np.asarray(logp)))
    occ = sigmoid(np.asarray(logits[best]).reshape(-1))
    t0 = time.time()
    vert, face = geoutil.array2mesh(occ, thresh=0.5,
                                    coords=np.asarray(all_Xtg))
    mesh_s = time.time() - t0
    log(f"marching tets: {mesh_s:.3f}s ({len(vert)} verts, {len(face)} faces)")

    total = device_s + mesh_s
    result = {"metric": "shape_completion_s", "value": round(total, 4),
              "unit": "s", "vs_baseline": round(1.0 / total, 3)}
    print(json.dumps(result))


if __name__ == "__main__":
    main()
