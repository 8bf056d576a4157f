"""3D U-Net over the quantized feature grid (channels-last NDHWC).

Semantics parity with shapeformer/models/vqdif/unet3d.py (the wolny/
pytorch-3dunet lineage) for the configuration the framework ships
(UNet3D: DoubleConv basic blocks, 'gcr' layer order, max-pool encoders,
nearest-upsample + concat decoders, final 1x1 conv; unet3d.py:103-496):
  - f_maps int -> geometric progression f_maps * 2^k over num_levels
  - encoder DoubleConv widths: conv1 out = max(out//2, in), conv2 -> out
  - decoder DoubleConv: conv1 in = skip + below, both convs -> out
  - conv bias only when no group/batch norm in the order
Also provides ExtResNetBlock/ResidualUNet3D for config parity.
"""
from __future__ import annotations

from typing import Sequence, Union

import flax.linen as nn
import jax.numpy as jnp

from .updown import upsample_nearest2x


def number_of_features_per_level(init_channels: int, num_levels: int):
    return [init_channels * 2 ** k for k in range(num_levels)]


class SingleConv(nn.Module):
    """One conv layer assembled from an order string over {c,r,l,e,g}
    (unet3d.py:19-76). GroupNorm channel count depends on position vs 'c'."""
    features: int
    order: str = "gcr"
    num_groups: int = 8
    kernel: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        has_norm = "g" in self.order or "b" in self.order
        for i, ch in enumerate(self.order):
            if ch == "c":
                x = nn.Conv(self.features, kernel_size=(self.kernel,) * 3,
                            padding="SAME", use_bias=not has_norm,
                            dtype=self.dtype, name=f"conv{i}")(x)
            elif ch == "r":
                x = nn.relu(x)
            elif ch == "l":
                x = nn.leaky_relu(x, negative_slope=0.1)
            elif ch == "e":
                x = nn.elu(x)
            elif ch in ("g", "b"):
                n_ch = x.shape[-1]
                groups = self.num_groups if n_ch >= self.num_groups else 1
                assert n_ch % groups == 0
                x = nn.GroupNorm(epsilon=1e-5, num_groups=groups, dtype=self.dtype,
                                 name=f"norm{i}")(x)
            else:
                raise ValueError(f"unsupported layer char {ch!r}")
        return x


class DoubleConv(nn.Module):
    out_channels: int
    encoder: bool
    order: str = "gcr"
    num_groups: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        if self.encoder:
            conv1_out = max(self.out_channels // 2, in_channels)
        else:
            conv1_out = self.out_channels
        x = SingleConv(conv1_out, self.order, self.num_groups,
                       dtype=self.dtype, name="SingleConv1")(x)
        return SingleConv(self.out_channels, self.order, self.num_groups,
                          dtype=self.dtype, name="SingleConv2")(x)


class ExtResNetBlock(nn.Module):
    """Residual basic block (unet3d.py:147-193); used by ResidualUNet3D."""
    out_channels: int
    encoder: bool = True  # unused; kept for interface parity
    order: str = "cge"
    num_groups: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = SingleConv(self.out_channels, self.order, self.num_groups,
                         dtype=self.dtype, name="conv1")(x)
        residual = out
        out = SingleConv(self.out_channels, self.order, self.num_groups,
                         dtype=self.dtype, name="conv2")(out)
        n_order = "".join(c for c in self.order if c not in "rel")
        out = SingleConv(self.out_channels, n_order, self.num_groups,
                         dtype=self.dtype, name="conv3")(out)
        out = out + residual
        if "l" in self.order:
            return nn.leaky_relu(out, negative_slope=0.1)
        if "e" in self.order:
            return nn.elu(out)
        return nn.relu(out)


class UNet3D(nn.Module):
    in_channels: int
    out_channels: int
    f_maps: Union[int, Sequence[int]] = 64
    layer_order: str = "gcr"
    num_groups: int = 8
    num_levels: int = 4
    final_sigmoid: bool = True      # parity arg; activation applies only in
    is_segmentation: bool = False   # 'testing' mode, which training never sets
    residual: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        f_maps = self.f_maps
        if isinstance(f_maps, int):
            f_maps = number_of_features_per_level(f_maps, self.num_levels)
        Block = ExtResNetBlock if self.residual else DoubleConv

        skips = []
        for i, out_f in enumerate(f_maps):
            if i > 0:
                x = nn.max_pool(x, window_shape=(2, 2, 2), strides=(2, 2, 2))
            x = Block(out_f, encoder=True, order=self.layer_order,
                      num_groups=self.num_groups, dtype=self.dtype,
                      name=f"encoder{i}")(x)
            skips.append(x)

        for i, skip in enumerate(reversed(skips[:-1])):
            x = upsample_nearest2x(x)
            if self.residual:
                x = skip + x
            else:
                x = jnp.concatenate([skip, x], axis=-1)
            x = Block(skip.shape[-1], encoder=False, order=self.layer_order,
                      num_groups=self.num_groups, dtype=self.dtype,
                      name=f"decoder{i}")(x)

        return nn.Conv(self.out_channels, kernel_size=(1, 1, 1),
                       dtype=self.dtype, name="final_conv")(x)


class ResidualUNet3D(UNet3D):
    residual: bool = True
    layer_order: str = "gcr"
    num_levels: int = 5
