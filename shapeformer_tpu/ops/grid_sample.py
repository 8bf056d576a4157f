"""Trilinear grid interpolation (channels-last), replacing F.grid_sample.

Reproduces torch.nn.functional.grid_sample(mode='bilinear',
padding_mode='border', align_corners=True) semantics as used by the implicit
decoder (shapeformer/models/vqdif/dec.py:62-68): XLA has no grid_sample
primitive, so this is 8 gathers + lerp, which XLA fuses; a Pallas variant is
a planned optimization for the 128^3-query decode path.
"""
from __future__ import annotations

import jax.numpy as jnp


def trilinear_sample(grid, p_nor):
    """Sample grid features at continuous normalized coordinates.

    Args:
      grid:  (B, X, Y, Z, C) feature volume (canonical channels-last layout).
      p_nor: (B, M, 3) coordinates in [0, 1]; axis d of p_nor indexes grid
             axis 1+d (align_corners=True: 0 -> voxel 0, 1 -> voxel res-1).
    Returns:
      (B, M, C) interpolated features.
    """
    B, X, Y, Z, C = grid.shape
    res = jnp.asarray([X, Y, Z], dtype=p_nor.dtype)
    f = p_nor * (res - 1.0)                       # continuous voxel coords
    raw = jnp.floor(f).astype(jnp.int32)
    w = (f - raw.astype(p_nor.dtype)).astype(grid.dtype)
    hi = jnp.asarray([X - 1, Y - 1, Z - 1], jnp.int32)
    # border padding: clamp BOTH corners from the raw floor — clamping i0
    # first and adding 1 after would interpolate inward for coords < 0
    # (pinned against torch grid_sample by tests/test_golden_torch.py)
    i0 = jnp.clip(raw, 0, hi)
    i1 = jnp.clip(raw + 1, 0, hi)

    b = jnp.arange(B, dtype=jnp.int32)[:, None]
    wx, wy, wz = w[..., 0:1], w[..., 1:2], w[..., 2:3]

    def corner(cx, cy, cz):
        ix = jnp.where(cx, i1[..., 0], i0[..., 0])
        iy = jnp.where(cy, i1[..., 1], i0[..., 1])
        iz = jnp.where(cz, i1[..., 2], i0[..., 2])
        return grid[b, ix, iy, iz]                # (B, M, C)

    c000, c001 = corner(0, 0, 0), corner(0, 0, 1)
    c010, c011 = corner(0, 1, 0), corner(0, 1, 1)
    c100, c101 = corner(1, 0, 0), corner(1, 0, 1)
    c110, c111 = corner(1, 1, 0), corner(1, 1, 1)

    c00 = c000 * (1 - wz) + c001 * wz
    c01 = c010 * (1 - wz) + c011 * wz
    c10 = c100 * (1 - wz) + c101 * wz
    c11 = c110 * (1 - wz) + c111 * wz
    c0 = c00 * (1 - wy) + c01 * wy
    c1 = c10 * (1 - wy) + c11 * wy
    return c0 * (1 - wx) + c1 * wx
