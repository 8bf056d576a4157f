"""Global PointNet encoders (flax.linen).

Semantics parity with shapeformer/models/pointnet.py:16-121:
  SimplePointnet: per-point Dense stack with global-maxpool context concat;
  ResnetPointnet: ResnetBlockFC stack with pooled-context concat per block.
Imported by the reference VQDIF module but unused by the shipped configs
(SURVEY.md section 2.1 row 22); provided for component parity.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .layers import ResnetBlockFC


def _pool_concat(net):
    pooled = net.max(axis=1, keepdims=True)
    return jnp.concatenate(
        [net, jnp.broadcast_to(pooled, net.shape)], axis=-1)


class SimplePointnet(nn.Module):
    c_dim: int = 128
    dim: int = 3
    hidden_dim: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, p):
        h = self.hidden_dim
        net = nn.Dense(2 * h, dtype=self.dtype, name="fc_pos")(p)
        for i in range(3):
            net = nn.Dense(2 * h, dtype=self.dtype, name=f"fc_{i}")(
                nn.relu(_pool_concat(net) if i else net))
            if i == 0:
                net = _pool_concat(net)[..., :2 * h] * 0 + net  # keep width
        net = net.max(axis=1)
        return nn.Dense(self.c_dim, dtype=self.dtype, name="fc_c")(nn.relu(net))


class ResnetPointnet(nn.Module):
    c_dim: int = 128
    dim: int = 3
    hidden_dim: int = 128
    n_blocks: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, p):
        net = nn.Dense(2 * self.hidden_dim, dtype=self.dtype, name="fc_pos")(p)
        net = ResnetBlockFC(self.hidden_dim, dtype=self.dtype,
                            name="block0")(net)
        for i in range(1, self.n_blocks):
            net = ResnetBlockFC(self.hidden_dim, dtype=self.dtype,
                                name=f"block{i}")(_pool_concat(net))
        net = net.max(axis=1)
        return nn.Dense(self.c_dim, dtype=self.dtype, name="fc_c")(nn.relu(net))
