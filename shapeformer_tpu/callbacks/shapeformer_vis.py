"""ShapeFormer completion callback: partial cloud -> ranked complete meshes.

Semantics parity with VisShapeFormer (shapeformer/models/shapeformer/
shapeformer.py:210-329): encode the partial cloud, expand the condition to
sample_n candidates, KV-cached AR sampling (top_k/top_p, best_in_first),
decode every candidate through the frozen VQDIF at decode_res^3, rank by
accumulated log-prob (compute_log_probs, shapeformer.py:407-418), export
meshes (.ply) + eval point clouds (.npz) + diagnostic renders.
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.vqdif.vqdif import VQDIF
from ..ops import sparse as sparse_ops
from ..utils import geoutil, visutil
from ..utils.nputil import makeGrid, sigmoid
from .base import VisCallback


class VisShapeFormer(VisCallback):
    def __init__(self, temperature=1.0, sample_n=10, top_k=300, top_p=0.9,
                 depth=4, decode_res=128, sample_max_step=512,
                 render_samples=64, end_tokens=None, mask_invalid=True,
                 mask_invalid_completion=False, force_keep_c_indices=False,
                 sort_prob=True, partial_radius=0.02, resolution=(256, 256),
                 chunk=65536, **kwargs):
        super().__init__(**kwargs)
        self.temperature, self.sample_n = temperature, sample_n
        self.top_k, self.top_p = top_k, top_p
        self.depth, self.decode_res = depth, decode_res
        self.sample_max_step = sample_max_step
        self.end_tokens = tuple(end_tokens) if end_tokens else None
        self.force_keep_c_indices = force_keep_c_indices
        self.sort_prob = sort_prob
        self.resolution = tuple(resolution)
        self.chunk = chunk
        self.all_Xtg = makeGrid([-1, -1, -1.0], [1.0, 1, 1],
                                [decode_res] * 3,
                                indexing="ij").astype(np.float32)
        self._sample_jit = None
        self._decode_jit = None

    # -------------------------------------------------------------- compute
    def _build(self):
        model = self.system.model
        rep = model.representer
        mesh = getattr(self.system, "mesh", None)

        def shard_candidates(x):
            """Under a trainer mesh, spread the sample_n candidate batch over
            the 'data' axis (the reference samples all candidates on one GPU,
            shapeformer.py:229; SURVEY.md section 2.2 TPU mapping)."""
            if mesh is not None and x.shape[0] % mesh.shape["data"] == 0:
                from jax.sharding import NamedSharding, PartitionSpec as P
                return jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, P("data")))
            return x

        def sample_fn(params, vqdif_vars, Xct, rng):
            c, _, _, others = rep.get_indices(Xct=Xct, stage="test",
                                              vqdif_vars=vqdif_vars)
            if mesh is None:
                # single device: prefill once, tile the caches to sample_n
                out, raw, logp = model.sample(
                    params, c, rng, max_steps=self.sample_max_step,
                    top_k=self.top_k, top_p=self.top_p,
                    temperature=self.temperature, best_in_first=True,
                    candidates=self.sample_n)
            else:
                # mesh: expand up front so the candidate batch carries an
                # explicit 'data' sharding through sampling; all rows are
                # candidates of ONE condition, so only row 0 pins to argmax
                c_exp = shard_candidates(
                    jnp.broadcast_to(c, (self.sample_n,) + c.shape[1:]))
                out, raw, logp = model.sample(
                    params, c_exp, rng, max_steps=self.sample_max_step,
                    top_k=self.top_k, top_p=self.top_p,
                    temperature=self.temperature,
                    best_rows=jnp.arange(self.sample_n) == 0)
            return out, raw, logp, c, others["empty_index"]

        vqdif = rep.vqdif_model
        chunk = min(self.chunk, self.all_Xtg.shape[0])

        def decode_fn(vqdif_vars, tokens, empty_index):
            # the query set IS the standard regular grid -> separable
            # decode_index_grid (MXU interp matmuls, ~10x over per-query
            # gathers on v5e); scan order matches self.all_Xtg (makeGrid 'ij')
            dense = shard_candidates(sparse_ops.sparse2dense(
                tokens, empty_index, 2 ** self.depth))
            return vqdif.apply(vqdif_vars, dense, self.decode_res,
                               method=VQDIF.decode_index_grid)["logits"]

        self._sample_jit = jax.jit(sample_fn)
        self._decode_jit = jax.jit(decode_fn)

    def compute_batch(self, batch, input_name=""):
        if self._sample_jit is None:
            self._build()
        params = self.state["params"]
        mesh = getattr(self.system, "mesh", None)
        if mesh is not None and mesh.shape.get("model", 1) > 1:
            # tensor-parallel serving: Megatron-shard the transformer weights
            # over 'model' so every AR step streams 1/tp of the weight bytes
            # per chip (the per-step weight read is the decode loop's dominant
            # cost); XLA inserts the proj/fc2 psums over ICI.
            from ..parallel import state_spec
            params = jax.device_put(params, state_spec(params, mesh))
        vqdif_vars = self.system.vqdif_vars
        # stable across processes (python str hash is PYTHONHASHSEED-salted,
        # which made repeated --mode run eval exports non-reproducible)
        import zlib
        rng = jax.random.PRNGKey(zlib.crc32(input_name.encode()) % (2 ** 31))
        out, raw, logp, c, empty_index = self._sample_jit(
            params, vqdif_vars, jnp.asarray(batch["Xct"]), rng)
        # observability for the multi-device inference path (tests assert on
        # these after a --mode run --gpus 0..n invocation)
        self.last_sample_devices = len(getattr(
            out.sharding, "device_set", {None}))
        self.last_candidates_sharded = not out.sharding.is_fully_replicated
        logits = self._decode_jit(vqdif_vars, out, empty_index)
        return dict(samples=np.asarray(out), origin_samples=np.asarray(raw),
                    log_prob=np.asarray(logp), c_ind=np.asarray(c),
                    empty_index=int(empty_index),
                    decoded_logits=np.asarray(logits), batch=batch)

    # ------------------------------------------------------------ visualize
    def visualize_batch(self, computed, input_name=""):
        batch = computed["batch"]
        samples = computed["samples"]
        imgs = {}
        if "Xbd" in batch:
            imgs["data_pc_c"] = visutil.render_cloud(
                batch["Xbd"][0], resolution=self.resolution)
        imgs["data_pc_p"] = visutil.render_cloud(batch["Xct"][0],
                                                 resolution=self.resolution)
        c_real = sparse_ops.filter_end_tokens(computed["c_ind"][0],
                                              self.end_tokens)
        imgs["data_c_quant_ind"] = visutil.render_voxel_indices(
            c_real[:, 0], c_real[:, 1], depth=self.depth,
            val_max=self.end_tokens[1], resolution=self.resolution)

        order = (np.argsort(-computed["log_prob"]) if self.sort_prob
                 else np.arange(samples.shape[0]))
        mesh_dir = os.path.join(self.data_dir, "meshes")
        eval_dir = os.path.join(self.data_dir, "eval")
        os.makedirs(mesh_dir, exist_ok=True)
        os.makedirs(eval_dir, exist_ok=True)
        eval_pcs = []
        rank = -1
        for i in order:
            occupancy = sigmoid(computed["decoded_logits"][i].reshape(-1))
            vert, face = geoutil.array2mesh(occupancy, thresh=0.5,
                                            coords=self.all_Xtg)
            if vert.shape[0] < 10:
                continue
            rank += 1
            geoutil.write_ply(os.path.join(
                mesh_dir, f"{input_name}_s{rank}.ply"), vert, face)
            imgs[f"s{rank}_decoded"] = visutil.render_mesh(
                vert, face, resolution=self.resolution)
            real = sparse_ops.filter_end_tokens(samples[i], self.end_tokens)
            imgs[f"s{rank}_quant_ind"] = visutil.render_voxel_indices(
                real[:, 0], real[:, 1], depth=self.depth,
                val_max=self.end_tokens[1], resolution=self.resolution)
            eval_pcs.append(geoutil.sampleMesh(vert, face, sampleN=10 ** 5))
        if eval_pcs:
            eval_dict = dict(eval_pc=eval_pcs[0])
            for eni, pc in enumerate(eval_pcs):
                eval_dict[f"recon_{eni}"] = pc
            np.savez(os.path.join(eval_dir, f"{input_name}.npz"), **eval_dict)
        return imgs
