"""Pallas TPU kernel for the encoder's fused segment pooling.

The LocalPoolPointnet inner loop (reference torch_scatter call sites:
shapeformer/models/vqdif/enc.py:95-112) needs, for every point, the max/mean
feature over all points sharing its voxel cell.  ops/scatter.pooled_gather
reformulates that as two inclusive segmented scans over the cell-id-sorted
point order (no dense grid, no TPU scatter).  This module provides the scan
core as a single-pass Pallas kernel:

  - sequential 1D grid over row tiles of the (rows, C) sorted feature matrix;
  - per-tile Hillis-Steele doubling scan on the VPU (log2(TILE) shifted
    max/add steps via pltpu.roll);
  - a (1, C) VMEM scratch carries the running segment aggregate across tiles
    (injected into a tile's first row unless that row starts a new segment).

Enabled from ops/scatter.pooled_gather via use_pallas=True or the env flag
SFTPU_PALLAS_SCATTER=1; correctness is pinned to the XLA associative_scan
path by tests/test_ops.py.  Falls back to interpret mode off-TPU so the same
code path is testable on the CPU mesh.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256


def _neutral(dtype, mode: str):
    if mode == "max":
        return jnp.asarray(jnp.finfo(dtype).min, dtype)
    return jnp.asarray(0, dtype)


def _scan_kernel(flags_ref, vals_ref, out_ref, carry_ref, *, mode: str):
    t = pl.program_id(0)
    op = jnp.maximum if mode == "max" else jnp.add
    neutral = _neutral(vals_ref.dtype, mode)

    @pl.when(t == 0)
    def _():
        carry_ref[:] = jnp.full_like(carry_ref, neutral)

    x = vals_ref[:]                                   # (TILE, C)
    f = flags_ref[:]                                  # (TILE, 1) int32 0/1
    # Mosaic's dynamic_rotate has no 1-bit variant -> keep flags int32
    rows = jax.lax.broadcasted_iota(jnp.int32, (TILE, 1), 0)

    # continue the previous tile's running segment into row 0
    x = jnp.where((rows == 0) & (f == 0), op(x, carry_ref[:]), x)

    d = 1
    while d < TILE:
        valid = rows >= d
        x_s = jnp.where(valid, pltpu.roll(x, d, axis=0), neutral)
        f_s = jnp.where(valid, pltpu.roll(f, d, axis=0), 1)
        x = jnp.where(f > 0, x, op(x, x_s))
        f = f | f_s
        d *= 2

    out_ref[:] = x
    carry_ref[:] = x[TILE - 1:TILE, :]


@functools.partial(jax.jit, static_argnames=("mode", "reverse", "interpret"))
def segmented_scan(vals, seg_start, mode: str = "max", reverse: bool = False,
                   interpret: bool = None):
    """Inclusive segmented scan along axis 1 (drop-in for scatter._seg_scan).

    vals: (B, N, C); seg_start: (B, N) bool — boundaries in scan direction
    (for reverse=True pass segment-END flags).  mode: 'max' | 'sum'.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out_dtype = vals.dtype
    if vals.dtype.itemsize < 4:
        # mosaic's dynamic_rotate handles 32-bit lanes only (bf16 encoder
        # features would fail to compile); scan in f32, cast back after
        vals = vals.astype(jnp.float32)
    B, N, C = vals.shape
    flat = vals.reshape(B * N, C)
    flags = seg_start.reshape(B * N, 1).astype(jnp.int32)
    if reverse:
        flat = flat[::-1]
        flags = flags[::-1]
    rows = B * N
    pad = (-rows) % TILE
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.full((pad, C), _neutral(flat.dtype, mode), flat.dtype)])
        flags = jnp.concatenate([flags, jnp.ones((pad, 1), jnp.int32)])
    n_tiles = (rows + pad) // TILE

    out = pl.pallas_call(
        functools.partial(_scan_kernel, mode=mode),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows + pad, C), flat.dtype),
        scratch_shapes=[pltpu.VMEM((1, C), flat.dtype)],
        interpret=interpret,
    )(flags, flat)

    out = out[:rows]
    if reverse:
        out = out[::-1]
    return out.reshape(B, N, C).astype(out_dtype)
