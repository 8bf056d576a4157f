"""LocalDecoder: implicit occupancy decoder conditioned on local grid features.

Semantics parity with shapeformer/models/vqdif/dec.py:10-100:
  optional UNet3D over the grid -> optional Upsampler -> trilinear sampling of
  features at query points -> 5x ResnetBlockFC with per-block fc_c feature
  conditioning -> ReLU -> 1-logit head.
F.grid_sample(align_corners=True, padding_mode='border') (dec.py:62-68) is
replaced by shapeformer_tpu.ops.grid_sample.trilinear_sample on the canonical
channels-last layout.

process_grid/query split the forward so the convolutional grid processing runs
once per shape while the per-query MLP is mapped over tiled query chunks (the
reference instead re-enters the whole decoder per 256^3 chunk, vqdif.py:60-72).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ...ops.grid_sample import trilinear_sample
from ...ops.gridcoords import normalize_3d_coordinate
from ..layers import ResnetBlockFC
from .unet3d import UNet3D
from .updown import Upsampler


class LocalDecoder(nn.Module):
    dim: int = 3
    c_dim: int = 128
    unet3d: bool = False
    unet3d_kwargs: Optional[dict] = None
    upsampler: bool = False
    upsampler_kwargs: Optional[dict] = None
    hidden_size: int = 256
    n_blocks: int = 5
    leaky: bool = False
    sample_mode: str = "bilinear"
    padding: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.unet = (UNet3D(dtype=self.dtype, **self.unet3d_kwargs)
                     if self.unet3d else None)
        self.upsampler_mod = (Upsampler(dtype=self.dtype, **self.upsampler_kwargs)
                              if self.upsampler else None)
        self.fc_p = nn.Dense(self.hidden_size, dtype=self.dtype)
        if self.c_dim != 0:
            self.fc_c = [nn.Dense(self.hidden_size, dtype=self.dtype)
                         for _ in range(self.n_blocks)]
        self.blocks = [ResnetBlockFC(dtype=self.dtype)
                       for _ in range(self.n_blocks)]
        self.fc_out = nn.Dense(1, dtype=self.dtype)

    def process_grid(self, c_grid):
        """UNet + upsample: (B, r, r, r, C) -> (B, R, R, R, C')."""
        if self.unet is not None:
            c_grid = self.unet(c_grid)
        if self.upsampler_mod is not None:
            c_grid = self.upsampler_mod(c_grid)
        return c_grid

    def query(self, p, c_grid_processed):
        """Implicit MLP at query points (B, M, 3) in [-0.5, 0.5] -> (B, M, 1)."""
        p_nor = normalize_3d_coordinate(p, padding=self.padding)
        c = trilinear_sample(c_grid_processed, p_nor.astype(self.dtype))
        return self._mlp(p.astype(self.dtype), c)

    def _mlp(self, p, c):
        net = self.fc_p(p)
        for i in range(self.n_blocks):
            if self.c_dim != 0:
                net = net + self.fc_c[i](c)
            net = self.blocks[i](net)
        act = (lambda x: nn.leaky_relu(x, 0.2)) if self.leaky else nn.relu
        return self.fc_out(act(net))

    # ------------------------------------------------- dense regular queries
    def query_grid(self, c_grid_processed, axes):
        """query() for a REGULAR query grid — the meshing path.

        axes: three 1D coordinate arrays (x (Rx,), y (Ry,), z (Rz,)) in
        [-0.5, 0.5]; the queries are their cartesian product in canonical
        (x, y, z) scan order.  Trilinear sampling on a regular grid is
        separable, so the per-query gathers (the generic path's bottleneck —
        ~130 ns/query gather-bound on v5e) become three small dense interp
        matmuls on the MXU; fc_p over the product grid is a rank-1 sum.
        Returns (B, Rx*Ry*Rz, 1) logits matching query().
        """
        g = c_grid_processed
        outs = []
        for d, ax in enumerate(axes):
            R_in = g.shape[1 + d]
            f = normalize_3d_coordinate(ax, padding=self.padding) * (R_in - 1)
            raw = jnp.floor(f).astype(jnp.int32)
            w = (f - raw).astype(self.dtype)
            i0 = jnp.clip(raw, 0, R_in - 1)
            i1 = jnp.clip(raw + 1, 0, R_in - 1)
            eye = jnp.eye(R_in, dtype=self.dtype)
            W = (eye[i0] * (1 - w)[:, None] + eye[i1] * w[:, None])  # (R, R_in)
            outs.append(W)
        Wx, Wy, Wz = outs
        g = jnp.einsum("rx,bxyzc->bryzc", Wx, g)
        g = jnp.einsum("sy,bryzc->brszc", Wy, g)
        c = jnp.einsum("tz,brszc->brstc", Wz, g)
        B = c.shape[0]
        Rx, Ry, Rz = (a.shape[0] for a in axes)
        c = c.reshape(B, Rx * Ry * Rz, c.shape[-1])
        # fc_p over the product grid: p @ W + b separates into per-axis
        # rank-1 contributions
        kern = self.fc_p.variables["params"]["kernel"].astype(self.dtype)
        bias = self.fc_p.variables["params"]["bias"].astype(self.dtype)
        px = jnp.outer(axes[0].astype(self.dtype), kern[0])  # (Rx, H)
        py = jnp.outer(axes[1].astype(self.dtype), kern[1])
        pz = jnp.outer(axes[2].astype(self.dtype), kern[2])
        net = (px[:, None, None, :] + py[None, :, None, :]
               + pz[None, None, :, :] + bias).reshape(1, Rx * Ry * Rz, -1)
        net = jnp.broadcast_to(net, (B,) + net.shape[1:])
        for i in range(self.n_blocks):
            if self.c_dim != 0:
                net = net + self.fc_c[i](c)
            net = self.blocks[i](net)
        act = (lambda x: nn.leaky_relu(x, 0.2)) if self.leaky else nn.relu
        return self.fc_out(act(net))

    def __call__(self, p, c_grid):
        return self.query(p, self.process_grid(c_grid))
