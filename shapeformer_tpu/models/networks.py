"""Generic network zoo: MLPs, SIREN layers, implicit decoders, NP-style
attention encoders.

Component parity with shapeformer/models/networks.py (SURVEY.md section 2.1
row 23 — a legacy library imported by the reference models but unused by the
shipped configs).  The genuinely reusable pieces are re-implemented in flax;
the torch-specific init/scheduler helpers map onto their jax equivalents.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class Identity(nn.Module):
    @nn.compact
    def __call__(self, x):
        return x


class MLP(nn.Module):
    """Dense stack with configurable activation (networks.py:180-202)."""
    features: Sequence[int]
    activation: str = "relu"
    final_activation: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        act = getattr(nn, self.activation)
        for i, f in enumerate(self.features[:-1]):
            x = act(nn.Dense(f, dtype=self.dtype, name=f"fc{i}")(x))
        x = nn.Dense(self.features[-1], dtype=self.dtype, name="fc_out")(x)
        if self.final_activation:
            x = getattr(nn, self.final_activation)(x)
        return x


class SineLayer(nn.Module):
    """SIREN layer: sin(omega * Wx + b) with the SIREN init scheme
    (networks.py:365-399)."""
    features: int
    omega_0: float = 30.0
    is_first: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        if self.is_first:
            init = nn.initializers.uniform(scale=2.0 / in_f)
        else:
            bound = jnp.sqrt(6.0 / in_f) / self.omega_0
            init = nn.initializers.uniform(scale=2.0 * bound)

        def centered(key, shape, dtype=jnp.float32):
            return init(key, shape, dtype) - (1.0 / in_f if self.is_first
                                              else jnp.sqrt(6.0 / in_f)
                                              / self.omega_0)
        x = nn.Dense(self.features, dtype=self.dtype,
                     kernel_init=centered, name="linear")(x)
        return jnp.sin(self.omega_0 * x)


class ImplicitModule(nn.Module):
    """Coordinate MLP with optional skip and latent conditioning
    (networks.py:328-364)."""
    hidden: int = 256
    n_layers: int = 5
    out_dim: int = 1
    c_dim: int = 0
    siren: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, p, c=None):
        x = p
        if c is not None and self.c_dim:
            cb = jnp.broadcast_to(c[:, None, :], p.shape[:-1] + (c.shape[-1],))
            x = jnp.concatenate([x, cb], axis=-1)
        for i in range(self.n_layers):
            if self.siren:
                x = SineLayer(self.hidden, is_first=(i == 0),
                              dtype=self.dtype, name=f"sine{i}")(x)
            else:
                x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype,
                                     name=f"fc{i}")(x))
        return nn.Dense(self.out_dim, dtype=self.dtype, name="fc_out")(x)


class AttentionModule(nn.Module):
    """Cross-attention from target queries to context key/values — the
    neural-process aggregation family (networks.py:457-645).  kind selects
    uniform (mean pooling), laplace, dot-product, or multihead."""
    dim_hidden: int
    kind: str = "dotproduct"
    n_heads: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q_x, k_x, v):
        """q_x (B, T, dx), k_x (B, C, dx), v (B, C, dv) -> (B, T, dim_hidden)."""
        if self.kind == "uniform":
            pooled = v.mean(axis=1, keepdims=True)
            out = jnp.broadcast_to(pooled, (v.shape[0], q_x.shape[1],
                                            v.shape[-1]))
            return nn.Dense(self.dim_hidden, dtype=self.dtype)(out)
        if self.kind == "laplace":
            scores = -jnp.abs(q_x[:, :, None, :] - k_x[:, None, :, :]).sum(-1)
            w = jax.nn.softmax(scores, axis=-1)
            return nn.Dense(self.dim_hidden, dtype=self.dtype)(
                jnp.einsum("btc,bcd->btd", w, v))
        if self.kind == "multihead":
            return nn.MultiHeadDotProductAttention(
                num_heads=self.n_heads, qkv_features=self.dim_hidden,
                out_features=self.dim_hidden, dtype=self.dtype)(q_x, k_x, v)
        # dot-product
        q = nn.Dense(self.dim_hidden, dtype=self.dtype, name="q")(q_x)
        k = nn.Dense(self.dim_hidden, dtype=self.dtype, name="k")(k_x)
        scores = jnp.einsum("btd,bcd->btc", q, k) / jnp.sqrt(self.dim_hidden)
        w = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("btc,bcd->btd",
                          w, nn.Dense(self.dim_hidden, dtype=self.dtype,
                                      name="v")(v))


class DeterministicEncoder(nn.Module):
    """Context-set encoder: per-pair MLP + attention aggregation
    (networks.py:668-709)."""
    dim_hidden: int = 128
    attention: str = "uniform"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, Xct, Yct, Xtg):
        pair = jnp.concatenate([Xct, Yct], axis=-1)
        r = MLP((self.dim_hidden,) * 3, dtype=self.dtype, name="pair_mlp")(pair)
        return AttentionModule(self.dim_hidden, kind=self.attention,
                               dtype=self.dtype, name="attn")(Xtg, Xct, r)


def split_context_target(x, y, num_context, num_extra_target, rng=None):
    """Random context/target split of a point set (networks.py:441-456)."""
    import numpy as np
    rng = rng or np.random.default_rng()
    total = x.shape[1]
    perm = rng.permutation(total)
    ci = perm[:num_context]
    ti = perm[:num_context + num_extra_target]
    return x[:, ci], y[:, ci], x[:, ti], y[:, ti]
