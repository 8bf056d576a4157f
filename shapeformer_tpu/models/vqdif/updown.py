"""Strided conv Downsampler / nearest-upsample Upsampler (channels-last).

Semantics parity with shapeformer/models/vqdif/updown.py:79-132:
  ConvLayer order 'crg' = Conv3d(bias=False) -> ReLU -> GroupNorm(8)
  Downsampler step: k=2 s=2 conv doubling channels, then 1x1x1 conv
  Upsampler step:   x2 nearest upsample, then two k=3 convs halving channels
All convs operate on (B, X, Y, Z, C) NDHWC tensors for TPU-friendly layout.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class ConvCRG(nn.Module):
    """Conv3d (no bias) -> ReLU -> GroupNorm(num_groups)."""
    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    num_groups: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = [(self.padding, self.padding)] * 3
        x = nn.Conv(self.features, kernel_size=(self.kernel,) * 3,
                    strides=(self.stride,) * 3, padding=pad, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.relu(x)
        groups = self.num_groups if self.features >= self.num_groups else 1
        return nn.GroupNorm(epsilon=1e-5, num_groups=groups, dtype=self.dtype, name="norm")(x)


class Downsampler(nn.Module):
    in_channels: int
    downsample_steps: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.in_channels
        for i in range(self.downsample_steps):
            c *= 2
            x = ConvCRG(c, kernel=2, stride=2, padding=0, dtype=self.dtype,
                        name=f"down{i}_conv")(x)
            x = ConvCRG(c, kernel=1, stride=1, padding=0, dtype=self.dtype,
                        name=f"down{i}_mix")(x)
        return x


def upsample_nearest2x(x):
    """(B, X, Y, Z, C) -> (B, 2X, 2Y, 2Z, C) nearest-neighbor."""
    for axis in (1, 2, 3):
        x = jnp.repeat(x, 2, axis=axis)
    return x


class Upsampler(nn.Module):
    in_channels: int
    upsampler_steps: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.in_channels
        for i in range(self.upsampler_steps):
            c = int(c / 2)
            x = upsample_nearest2x(x)
            x = ConvCRG(c, kernel=3, stride=1, padding=1, dtype=self.dtype,
                        name=f"up{i}_conv0")(x)
            x = ConvCRG(c, kernel=3, stride=1, padding=1, dtype=self.dtype,
                        name=f"up{i}_conv1")(x)
        return x
