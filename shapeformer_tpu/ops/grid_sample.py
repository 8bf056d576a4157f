"""Trilinear grid interpolation (channels-last), replacing F.grid_sample.

Reproduces torch.nn.functional.grid_sample(mode='bilinear',
padding_mode='border', align_corners=True) semantics as used by the implicit
decoder (shapeformer/models/vqdif/dec.py:62-68): XLA has no grid_sample
primitive, so the forward is 8 gathers + lerp, which XLA fuses.

The backward is hand-written (jax.custom_vjp): autodiff's transpose of the
corner gathers is an XLA scatter-add of B*8M duplicate-index rows into the
(B, X*Y*Z, C) grid — measured 62.6 ms/step at the VQDIF flagship training
shapes (B8, 8192 queries, 64^3 x 32 grid) on v5e, the single largest op in
the train step, because TPU scatters serialize.  _tri_bwd instead routes the
corner contributions through ops.scatter.scatter_add_dense (sort + ends-only
segment sum + pointer store + one row gather) and computes the exact
coordinate gradient from re-gathered corner values.  Gradients match
autodiff to f32 tolerance (tests/test_ops.py::test_trilinear_sample_grad*).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import scatter


def _corners(grid_shape, p_nor, dtype):
    """Clamped corner indices i0/i1 (B, M, 3) and lerp weights w (B, M, 3)."""
    B, X, Y, Z, C = grid_shape
    res = jnp.asarray([X, Y, Z], dtype=p_nor.dtype)
    f = p_nor * (res - 1.0)                       # continuous voxel coords
    raw = jnp.floor(f).astype(jnp.int32)
    w = (f - raw.astype(p_nor.dtype)).astype(dtype)
    hi = jnp.asarray([X - 1, Y - 1, Z - 1], jnp.int32)
    # border padding: clamp BOTH corners from the raw floor — clamping i0
    # first and adding 1 after would interpolate inward for coords < 0
    # (pinned against torch grid_sample by tests/test_golden_torch.py)
    i0 = jnp.clip(raw, 0, hi)
    i1 = jnp.clip(raw + 1, 0, hi)
    return i0, i1, w


def _corner_weights(w):
    """(B, M, 3) lerp weights -> per-corner weights, order c000..c111
    (z minor, like _impl's lerp ladder).  Returns (8, B, M)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    ux, uy, uz = 1 - wx, 1 - wy, 1 - wz
    return jnp.stack([ux * uy * uz, ux * uy * wz, ux * wy * uz, ux * wy * wz,
                      wx * uy * uz, wx * uy * wz, wx * wy * uz, wx * wy * wz])


def _gather_corners(grid, i0, i1):
    """The 8 clamped-corner feature rows: (8, B, M, C), order c000..c111."""
    B = grid.shape[0]
    b = jnp.arange(B, dtype=jnp.int32)[:, None]
    outs = []
    for cx in (0, 1):
        for cy in (0, 1):
            for cz in (0, 1):
                ix = (i1 if cx else i0)[..., 0]
                iy = (i1 if cy else i0)[..., 1]
                iz = (i1 if cz else i0)[..., 2]
                outs.append(grid[b, ix, iy, iz])
    return jnp.stack(outs)


def _impl(grid, p_nor):
    i0, i1, w = _corners(grid.shape, p_nor, grid.dtype)
    (c000, c001, c010, c011,
     c100, c101, c110, c111) = _gather_corners(grid, i0, i1)
    wx, wy, wz = w[..., 0:1], w[..., 1:2], w[..., 2:3]
    c00 = c000 * (1 - wz) + c001 * wz
    c01 = c010 * (1 - wz) + c011 * wz
    c10 = c100 * (1 - wz) + c101 * wz
    c11 = c110 * (1 - wz) + c111 * wz
    c0 = c00 * (1 - wy) + c01 * wy
    c1 = c10 * (1 - wy) + c11 * wy
    return c0 * (1 - wx) + c1 * wx


@jax.custom_vjp
def trilinear_sample(grid, p_nor):
    """Sample grid features at continuous normalized coordinates.

    Args:
      grid:  (B, X, Y, Z, C) feature volume (canonical channels-last layout).
      p_nor: (B, M, 3) coordinates in [0, 1]; axis d of p_nor indexes grid
             axis 1+d (align_corners=True: 0 -> voxel 0, 1 -> voxel res-1).
    Returns:
      (B, M, C) interpolated features.
    """
    return _impl(grid, p_nor)


def _tri_fwd(grid, p_nor):
    return _impl(grid, p_nor), (grid, p_nor)


def _tri_bwd(res, g):
    grid, p_nor = res
    B, X, Y, Z, C = grid.shape
    M = p_nor.shape[1]
    i0, i1, w = _corners(grid.shape, p_nor, grid.dtype)
    cw = _corner_weights(w)                                 # (8, B, M)

    # ---- dgrid: per-corner contributions summed into cells (no XLA scatter)
    strides = jnp.asarray([Y * Z, Z, 1], jnp.int32)
    ids = []
    for cx in (0, 1):
        for cy in (0, 1):
            for cz in (0, 1):
                ix = (i1 if cx else i0)[..., 0]
                iy = (i1 if cy else i0)[..., 1]
                iz = (i1 if cz else i0)[..., 2]
                ids.append(ix * strides[0] + iy * strides[1] + iz)
    ids8 = jnp.stack(ids, axis=1).reshape(B, 8 * M)         # (B, 8M)
    u = (cw[:, :, :, None] * g[None, ...]).astype(g.dtype)  # (8, B, M, C)
    u8 = jnp.transpose(u, (1, 0, 2, 3)).reshape(B, 8 * M, C)
    dgrid = scatter.scatter_add_dense(u8, ids8, X * Y * Z)
    dgrid = dgrid.reshape(B, X, Y, Z, C).astype(grid.dtype)

    # ---- dp_nor (exact): chain through the lerp weights; clamped corners
    # produce equal values so their difference terms vanish — matching
    # autodiff's zero gradient outside the border, floor() contributing 0.
    (c000, c001, c010, c011,
     c100, c101, c110, c111) = _gather_corners(grid, i0, i1)
    wx, wy, wz = w[..., 0:1], w[..., 1:2], w[..., 2:3]
    ux, uy = 1 - wx, 1 - wy
    c00, c01 = c000 * (1 - wz) + c001 * wz, c010 * (1 - wz) + c011 * wz
    c10, c11 = c100 * (1 - wz) + c101 * wz, c110 * (1 - wz) + c111 * wz
    c0, c1 = c00 * uy + c01 * wy, c10 * uy + c11 * wy
    gf = g.astype(jnp.float32)
    d_wx = (gf * (c1 - c0).astype(jnp.float32)).sum(-1)
    d_wy = (gf * (ux * (c01 - c00) + wx * (c11 - c10)
                  ).astype(jnp.float32)).sum(-1)
    d_wz = (gf * (ux * (uy * (c001 - c000) + wy * (c011 - c010))
                  + wx * (uy * (c101 - c100) + wy * (c111 - c110))
                  ).astype(jnp.float32)).sum(-1)
    res_m1 = jnp.asarray([X - 1, Y - 1, Z - 1], jnp.float32)
    dp = jnp.stack([d_wx, d_wy, d_wz], axis=-1) * res_m1
    return dgrid, dp.astype(p_nor.dtype)


trilinear_sample.defvjp(_tri_fwd, _tri_bwd)
