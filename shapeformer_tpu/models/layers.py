"""Shared fully-connected building blocks (flax.linen).

ResnetBlockFC mirrors the reference block exactly (shapeformer/models/
layers.py:6-48): pre-activation ReLU, zero-initialized second FC, and a
bias-free linear shortcut when in/out widths differ.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


class ResnetBlockFC(nn.Module):
    size_out: Optional[int] = None
    size_h: Optional[int] = None
    size_in: Optional[int] = None  # inferred from input when None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        size_in = self.size_in or x.shape[-1]
        size_out = self.size_out or size_in
        size_h = self.size_h or min(size_in, size_out)

        net = nn.Dense(size_h, dtype=self.dtype, name="fc_0")(nn.relu(x))
        dx = nn.Dense(size_out, dtype=self.dtype, name="fc_1",
                      kernel_init=nn.initializers.zeros)(nn.relu(net))
        if size_in == size_out:
            x_s = x
        else:
            x_s = nn.Dense(size_out, use_bias=False, dtype=self.dtype,
                           name="shortcut")(x)
        return x_s + dx
