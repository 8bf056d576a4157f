"""Shared fully-connected building blocks (flax.linen).

ResnetBlockFC mirrors the reference block exactly (shapeformer/models/
layers.py:6-48): pre-activation ReLU, zero-initialized second FC, and a
bias-free linear shortcut when in/out widths differ.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
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


class CBatchNorm1d(nn.Module):
    """Conditional batch norm: gamma/beta regressed from a latent code
    (layers.py:193-244).  Normalization is per-feature over (B, N) like the
    torch BatchNorm1d it mirrors; conditioning via two Dense maps of c.

    NOTE on the running-statistics path: no shipped config reaches these
    blocks (the reference's CBatchNorm decoders are likewise unused by its
    shipped configs, SURVEY.md section 2.1 row 21), so in-package nothing
    passes use_running_average=True or marks 'batch_stats' mutable — the
    path is exercised only by unit tests (tests/test_models.py).  A future
    caller training through these blocks must mark 'batch_stats' mutable in
    train steps, carry the collection through create_state/checkpointing,
    and pass use_running_average=True at eval."""
    c_dim: int
    f_dim: int
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    momentum: float = 0.9

    @nn.compact
    def __call__(self, x, c, use_running_average: bool = False):
        # x: (B, N, f_dim), c: (B, c_dim)
        gamma = nn.Dense(self.f_dim, dtype=self.dtype,
                         kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.ones, name="conv_gamma")(c)
        beta = nn.Dense(self.f_dim, dtype=self.dtype,
                        kernel_init=nn.initializers.zeros, name="conv_beta")(c)
        # running statistics like the torch BatchNorm1d it mirrors
        # (layers.py:193-244): eval normalizes with the running estimate so
        # outputs don't depend on batch composition; the estimate updates
        # only when the caller marks 'batch_stats' mutable (training)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((1, 1, self.f_dim)))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((1, 1, self.f_dim)))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean = x.mean(axis=(0, 1), keepdims=True)
            var = x.var(axis=(0, 1), keepdims=True)
            if self.is_mutable_collection("batch_stats"):
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        norm = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return gamma[:, None, :] * norm + beta[:, None, :]


class CResnetBlockConv1d(nn.Module):
    """Conditionally-normalized residual block (layers.py:51-109)."""
    c_dim: int
    size_in: int
    size_h: Optional[int] = None
    size_out: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, c, use_running_average: bool = False):
        size_h = self.size_h or self.size_in
        size_out = self.size_out or self.size_in
        net = CBatchNorm1d(self.c_dim, self.size_in, dtype=self.dtype,
                           name="bn_0")(x, c, use_running_average)
        net = nn.Dense(size_h, dtype=self.dtype, name="fc_0")(nn.relu(net))
        net = CBatchNorm1d(self.c_dim, size_h, dtype=self.dtype,
                           name="bn_1")(net, c, use_running_average)
        dx = nn.Dense(size_out, dtype=self.dtype, name="fc_1",
                      kernel_init=nn.initializers.zeros)(nn.relu(net))
        if self.size_in == size_out:
            x_s = x
        else:
            x_s = nn.Dense(size_out, use_bias=False, dtype=self.dtype,
                           name="shortcut")(x)
        return x_s + dx


class ResnetBlockConv1d(nn.Module):
    """Unconditional 1d-conv-style residual block (layers.py:110-158)."""
    size_in: int
    size_h: Optional[int] = None
    size_out: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        size_h = self.size_h or self.size_in
        size_out = self.size_out or self.size_in
        net = nn.Dense(size_h, dtype=self.dtype, name="fc_0")(nn.relu(x))
        dx = nn.Dense(size_out, dtype=self.dtype, name="fc_1",
                      kernel_init=nn.initializers.zeros)(nn.relu(net))
        if self.size_in == size_out:
            x_s = x
        else:
            x_s = nn.Dense(size_out, use_bias=False, dtype=self.dtype,
                           name="shortcut")(x)
        return x_s + dx


class AffineLayer(nn.Module):
    """Learned 3D affine transform of query points (layers.py:159-192)."""
    c_dim: int
    dim: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, p, c):
        A = nn.Dense(self.dim * self.dim, dtype=self.dtype,
                     kernel_init=nn.initializers.zeros,
                     bias_init=lambda *a: jnp.eye(self.dim).reshape(-1),
                     name="fc_A")(c)
        b = nn.Dense(self.dim, dtype=self.dtype,
                     kernel_init=nn.initializers.zeros, name="fc_b")(c)
        A = A.reshape(-1, self.dim, self.dim)
        return jnp.einsum("bij,bnj->bni", A, p) + b[:, None, :]
