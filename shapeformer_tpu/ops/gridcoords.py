"""Device-side (jnp) coordinate <-> grid-cell transforms.

Canonical axis convention used throughout shapeformer_tpu:
  - feature grids are channels-last:  (B, X, Y, Z, C)
  - flat cell ids are C-order over (ix, iy, iz):  flat = ix*r^2 + iy*r + iz
This single convention replaces the reference's convonet/shapeformer axis
swizzles (shapeformer/models/shapeformer/common.py:67-80); interop helpers for
reference-ordered dumps live in shapeformer_tpu.ops.sparse.

Semantics parity:
  normalize_3d_coordinate  shapeformer/models/vqdif/common.py:260-276
  coordinate2index         shapeformer/models/vqdif/common.py:301-322
  point2index/index2point  xgutils/ptutil.py:425-489
"""
from __future__ import annotations

import jax.numpy as jnp


def normalize_3d_coordinate(p, padding: float = 0.1):
    """Map points from roughly [-0.5-pad/2, 0.5+pad/2] to [0, 1).

    Mirrors the reference's eps choices exactly (vqdif/common.py:269-276):
    divide by (1 + padding + 1e-3), shift by 0.5, clamp to [0, 1-1e-3].
    """
    p_nor = p / (1.0 + padding + 10e-4) + 0.5
    return jnp.clip(p_nor, 0.0, 1.0 - 10e-4)


def coordinate2index(p_nor, reso: int):
    """Normalized [0,1) points (..., 3) -> flat cell ids (...,) in canonical order."""
    cell = jnp.floor(p_nor * reso).astype(jnp.int32)
    cell = jnp.clip(cell, 0, reso - 1)
    return (cell[..., 0] * reso + cell[..., 1]) * reso + cell[..., 2]


def ravel_index(idx, shape):
    out = idx[..., 0].astype(jnp.int32)
    for d in range(1, idx.shape[-1]):
        out = out * shape[d] + idx[..., d]
    return out


def unravel_index(flat, shape):
    flat = flat.astype(jnp.int32)
    out = []
    for d in range(len(shape) - 1, -1, -1):
        out.append(flat % shape[d])
        flat = flat // shape[d]
    return jnp.stack(out[::-1], axis=-1)


def point2index(points, grid_dim: int = 32, ravel: bool = False):
    """Points in [-1,1]^D -> nearest cell on an 'in'-mode grid (ptutil.py:425-470)."""
    p01 = (points + 1.0) / 2.0
    idx = jnp.clip(jnp.round(p01 * grid_dim - 0.5), 0, grid_dim - 1).astype(jnp.int32)
    if ravel:
        return ravel_index(idx, (grid_dim,) * points.shape[-1])
    return idx


def index2point(index, grid_dim: int = 32):
    """Cell index -> cell-center coordinate in [-1,1] (ptutil.py:471-489)."""
    return ((index.astype(jnp.float32) + 0.5) / grid_dim) * 2.0 - 1.0
