"""Multi-chip parallelism: one jax.sharding.Mesh, GSPMD-annotated pjit steps.

This replaces the reference's distributed story (SURVEY.md section 2.2):
PL dp/ddp + NCCL all-reduce (shapeformer/trainer.py:49-56) becomes a
('data', 'model') device mesh where
  - the batch dim is sharded over 'data' (gradient psum inserted by XLA);
  - transformer matmuls are Megatron-style tensor-parallel over 'model':
    qkv/fc1/head kernels column-sharded, proj/fc2 row-sharded, embedding
    tables vocab-sharded, norms/positions replicated;
  - multi-candidate completion shards the sample_n candidate batch over
    'data' (the reference samples all candidates on one GPU,
    shapeformer.py:229);
  - EMA codebook statistics are computed on the global batch (fixing the
    reference's per-rank ddp divergence, SURVEY.md section 7 'hard parts').
No collective is written by hand: shardings are declared, XLA inserts
all-reduce / all-gather / reduce-scatter over ICI.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, dp: Optional[int] = None,
              tp: Optional[int] = None, devices=None) -> Mesh:
    """('data', 'model') mesh over the available devices.

    Defaults: all of tp into the model axis only when explicitly requested;
    otherwise pure data parallelism (the reference's only strategy).
    """
    devices = devices if devices is not None else jax.devices()
    n = n_devices or len(devices)
    devices = np.asarray(devices[:n])
    if dp is None and tp is None:
        dp, tp = n, 1
    elif dp is None:
        dp = n // tp
    elif tp is None:
        tp = n // dp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != devices({n})"
    return Mesh(devices.reshape(dp, tp), axis_names=("data", "model"))


# ------------------------------------------------------------------ p-specs
def _param_spec(path_names, shape):
    """Megatron-style spec for one transformer/VQDIF parameter leaf."""
    names = [str(n) for n in path_names]
    leaf = names[-1]
    parent = names[-2] if len(names) >= 2 else ""
    if leaf == "embedding":
        return P("model", None)
    if leaf in ("pos_emb", "cond_pos_emb"):
        return P()
    if leaf == "kernel" and len(shape) == 2:
        if parent in ("qkv", "fc1"):
            return P(None, "model")            # column parallel
        if parent in ("proj", "fc2"):
            return P("model", None)            # row parallel
        if any(n.startswith("heads_") or n.startswith("Dense") for n in names):
            return P(None, "model")            # vocab-sharded output head
        return P()
    if leaf == "bias" and len(shape) == 1 and parent in ("qkv", "fc1"):
        return P("model")
    return P()


def _spec_for_state_path(path, leaf):
    """Sharding spec for any leaf of a train-state pytree, keyed on the param
    path embedded in it (optimizer moments mirror the param tree)."""
    names = []
    for part in path:
        if hasattr(part, "key"):
            names.append(str(part.key))
        elif hasattr(part, "name"):
            names.append(str(part.name))
        elif hasattr(part, "idx"):
            names.append(f"[{part.idx}]")
    shape = getattr(leaf, "shape", ())
    if not shape:
        return P()
    # optimizer scalar counts / step counters
    if names and names[-1] in ("count", "step"):
        return P()
    return _param_spec(names, shape)


def _fit_spec(spec: P, shape, mesh: Mesh) -> P:
    """Drop (or re-home) sharded axes whose dimension is not divisible by the
    mesh axis size — device_put requires exact divisibility (e.g. the 4097-row
    vocab tables cannot split over tp; shard their feature dim instead)."""
    entries = list(spec) + [None] * (len(shape) - len(spec))
    fitted = []
    for dim, name in zip(shape, entries):
        ok = name is not None and dim % mesh.shape[name] == 0
        fitted.append(name if ok else None)
    for name in set(e for e in entries if e is not None):
        if name not in fitted:
            for i, (dim, cur) in enumerate(zip(shape, fitted)):
                if cur is None and dim % mesh.shape[name] == 0:
                    fitted[i] = name
                    break
    return P(*fitted)


def state_spec(state, mesh: Mesh):
    """NamedSharding tree for a system train state (params + opt moments
    sharded identically; everything else replicated)."""
    def make(path, leaf):
        spec = _spec_for_state_path(path, leaf)
        spec = _fit_spec(spec, getattr(leaf, "shape", ()), mesh)
        return NamedSharding(mesh, spec)
    return jax.tree_util.tree_map_with_path(make, state)


def batch_spec(batch, mesh: Mesh):
    """Batch-dim ('data') sharding for every array in a batch dict."""
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(
            mesh, P("data") if getattr(x, "ndim", 0) >= 1 else P()), batch)


def replicated(tree, mesh: Mesh):
    return jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()), tree)


# ------------------------------------------------------------------- wiring
def shard_train_step(system, mesh: Mesh, state, sample_batch,
                     has_rng: bool = True, extra_args=()):
    """jit the system's train step with explicit mesh shardings.

    Returns (sharded_step, sharded_state): state placed per spec, batch
    expected data-sharded; gradients/EMA reductions become XLA collectives.

    Mesh-sharded steps keep the XLA attention: the flash pallas_call does
    not auto-partition under GSPMD (mingpt.set_flash_enabled docstring).
    """
    from ..models.shapeformer.transformer import mingpt
    mingpt.set_flash_enabled(False)
    s_spec = state_spec(state, mesh)
    b_spec = batch_spec(sample_batch, mesh)
    extra_spec = tuple(replicated(a, mesh) for a in extra_args)
    rng_spec = (NamedSharding(mesh, P()),) if has_rng else ()
    step = jax.jit(
        system._train_step_impl,
        in_shardings=(s_spec, b_spec) + rng_spec + extra_spec,
        out_shardings=(s_spec, None),
        donate_argnums=(0,))
    sharded_state = jax.device_put(state, s_spec)
    return step, sharded_state


def shard_eval_step(system, mesh: Mesh, state, sample_batch,
                    has_rng: bool = True, extra_args=()):
    """jit the system's eval step with the same shardings as training."""
    s_spec = state_spec(state, mesh)
    b_spec = batch_spec(sample_batch, mesh)
    extra_spec = tuple(replicated(a, mesh) for a in extra_args)
    rng_spec = (NamedSharding(mesh, P()),) if has_rng else ()
    return jax.jit(system._eval_step_impl,
                   in_shardings=(s_spec, b_spec) + rng_spec + extra_spec,
                   out_shardings=None)


def shard_sample_fn(sample_fn, mesh: Mesh, params, c_indices):
    """jit a (params, c_indices, rng) -> tokens sampler with candidates
    sharded over 'data' and params sharded over 'model'."""
    p_spec = state_spec(params, mesh)
    c_spec = NamedSharding(mesh, P("data"))
    return jax.jit(sample_fn,
                   in_shardings=(p_spec, c_spec, NamedSharding(mesh, P())),
                   out_shardings=None)
