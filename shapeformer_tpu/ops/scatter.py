"""Point -> grid scatter pooling (the encoder hot loop).

TPU-native replacement for torch_scatter.scatter_max / scatter_mean
(reference call sites: shapeformer/models/vqdif/enc.py:5,59-64,72,95-112).
Implemented with jax.ops.segment_* over per-batch-offset flat cell ids; a
fused Pallas kernel for the scatter+gather pattern lives in
shapeformer_tpu.ops.pallas_scatter and is used when enabled.

Empty-cell convention matches torch_scatter's zero-fill: cells containing no
point pool to 0 (relevant only for the final scatter_mean grid; max-pooled
values are gathered back exclusively at occupied cells).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _flat_segments(ids, n_cells: int):
    """(B, N) per-batch cell ids -> (B*N,) global segment ids."""
    B, N = ids.shape
    offset = jnp.arange(B, dtype=ids.dtype)[:, None] * n_cells
    return (ids + offset).reshape(-1)


def scatter_max(c, ids, n_cells: int):
    """(B, N, C), (B, N) -> (B, n_cells, C): per-cell feature max, 0 for empty."""
    B, N, C = c.shape
    seg = _flat_segments(ids, n_cells)
    pooled = jax.ops.segment_max(c.reshape(B * N, C), seg,
                                 num_segments=B * n_cells)
    pooled = jnp.where(jnp.isneginf(pooled), 0.0, pooled)
    return pooled.reshape(B, n_cells, C)


def scatter_mean(c, ids, n_cells: int):
    """(B, N, C), (B, N) -> (B, n_cells, C): per-cell feature mean, 0 for empty."""
    B, N, C = c.shape
    seg = _flat_segments(ids, n_cells)
    ssum = jax.ops.segment_sum(c.reshape(B * N, C), seg,
                               num_segments=B * n_cells)
    cnt = jax.ops.segment_sum(jnp.ones((B * N, 1), c.dtype), seg,
                              num_segments=B * n_cells)
    return (ssum / jnp.maximum(cnt, 1.0)).reshape(B, n_cells, C)


def gather_cells(grid, ids):
    """(B, n_cells, C), (B, N) -> (B, N, C): read each point's cell feature."""
    return jnp.take_along_axis(grid, ids[..., None], axis=1)


def occupancy_mask(ids, n_cells: int):
    """(B, N) -> (B, n_cells) bool: True where a cell contains >= 1 point
    (replaces the index_put mask build at enc.py:85-91)."""
    B = ids.shape[0]
    seg = _flat_segments(ids, n_cells)
    cnt = jax.ops.segment_sum(jnp.ones_like(seg, jnp.int32), seg,
                              num_segments=B * n_cells)
    return (cnt > 0).reshape(B, n_cells)
