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


class SoftPlus(nn.Module):
    """softplus with sharpness beta (networks.py:319-326)."""
    beta: float = 100.0

    @nn.compact
    def __call__(self, x):
        return nn.softplus(x * self.beta) / self.beta


class SDFModule(nn.Module):
    """8-layer softplus SDF MLP with a mid skip of the input
    (networks.py:292-317; build_sdfnetwork:129-143)."""
    input_dim: int = 3
    latent_dim: int = 512
    beta: float = 100.0

    @nn.compact
    def __call__(self, x):
        sp = SoftPlus(self.beta)
        h = sp(nn.Dense(self.latent_dim, name="l1")(x))
        h = sp(nn.Dense(self.latent_dim, name="l2")(h))
        h = sp(nn.Dense(self.latent_dim, name="l3")(h))
        h = sp(nn.Dense(self.latent_dim - self.input_dim, name="l4")(h))
        h = jnp.concatenate([h, x], axis=-1)
        h = sp(nn.Dense(self.latent_dim, name="l5")(h))
        h = sp(nn.Dense(self.latent_dim, name="l6")(h))
        h = sp(nn.Dense(self.latent_dim, name="l7")(h))
        return nn.Dense(1, name="l_out")(h)


class Dense(nn.Module):
    """Linear + optional BatchNorm1d + activation (networks.py:150-178).
    activation in {None, 'relu', 'sigmoid'}, like the reference."""
    out_channel: int
    bn: bool = False
    activation: Optional[str] = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        x = nn.Dense(self.out_channel, dtype=self.dtype, name="dense")(x)
        if self.bn:
            x = nn.BatchNorm(use_running_average=use_running_average,
                             dtype=self.dtype, name="bn")(x)
        if self.activation is None:
            return x
        if self.activation == "relu":
            return nn.relu(x)
        if self.activation == "sigmoid":
            return nn.sigmoid(x)
        raise NotImplementedError(
            f"activation {self.activation} is not supported here")


class CSDFModule(nn.Module):
    """1x1-Conv1d SDF stack (networks.py:257-290).  With channels-last layout
    a 1x1 Conv1d IS a Dense, so each l_i maps to nn.Dense; the reference
    applies batch norm ONLY after l1 (bn_1, affine=False — bn_2..bn_6 are
    constructed upstream but never called in forward, i.e. dead), which is
    reproduced here.  Input/output (B, N, input_dim) -> (B, N, 1); the
    reference's NCL transposes vanish in channels-last."""
    input_dim: int = 3
    beta: float = 100.0

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        latent_dim = 512
        sp = SoftPlus(self.beta)
        h = nn.Dense(latent_dim, name="l1")(x)
        h = nn.BatchNorm(use_running_average=use_running_average,
                         use_bias=False, use_scale=False, name="bn_1")(h)
        h = sp(h)
        h = sp(nn.Dense(latent_dim, name="l2")(h))
        h = sp(nn.Dense(latent_dim, name="l3")(h))
        h = sp(nn.Dense(latent_dim - self.input_dim, name="l4")(h))
        h = jnp.concatenate([h, x], axis=-1)
        h = sp(nn.Dense(latent_dim, name="l5")(h))
        h = sp(nn.Dense(latent_dim, name="l6")(h))
        h = sp(nn.Dense(latent_dim, name="l7")(h))
        return nn.Dense(1, name="l_out")(h)


class ImplicitModule2(nn.Module):
    """Fixed 7-layer implicit MLP with optional input skip after l4 and
    activation in {relu, softplus, sin} (networks.py:400-436).  The upstream
    class cannot even be constructed (`self.net.append` on an undefined
    attribute at networks.py:408-409 raises AttributeError); this implements
    the evident intent — the same forward as the reference's ImplicitModule
    (networks.py:328-364)."""
    input_dim: int = 3
    output_dim: int = 1
    latent_dim: int = 512
    activation: str = "softplus"
    skip: bool = True

    def _act(self, x):
        if self.activation == "relu":
            return nn.relu(x)
        if self.activation == "softplus":
            return nn.softplus(x * 100.0) / 100.0
        if self.activation == "sin":
            return jnp.sin(x)
        raise KeyError(self.activation)

    @nn.compact
    def __call__(self, x):
        h = self._act(nn.Dense(self.latent_dim, name="l1")(x))
        h = self._act(nn.Dense(self.latent_dim, name="l2")(h))
        h = self._act(nn.Dense(self.latent_dim, name="l3")(h))
        l4_out = (self.latent_dim - self.input_dim if self.skip
                  else self.latent_dim)
        h = self._act(nn.Dense(l4_out, name="l4")(h))
        if self.skip:
            h = jnp.concatenate([h, x], axis=-1)
        h = self._act(nn.Dense(self.latent_dim, name="l5")(h))
        h = self._act(nn.Dense(self.latent_dim, name="l6")(h))
        h = self._act(nn.Dense(self.latent_dim, name="l7")(h))
        return nn.Dense(self.output_dim, name="l_out")(h)


class NCLConv1d(nn.Module):
    """Adapter presenting a channels-FIRST (B, C, N) module with a
    channels-last (B, N, C) interface (networks.py:594-600).  flax convs are
    channels-last natively, so this transposes around the wrapped module —
    kept for API parity with callers holding reference-style NCL modules."""
    module: nn.Module

    @nn.compact
    def __call__(self, x):
        return jnp.transpose(self.module(jnp.transpose(x, (0, 2, 1))),
                             (0, 2, 1))


def build_sdfnetwork(input_dim=3, init_radius=0.0):
    """networks.py:129-143 (the geometric-init comments upstream are dead)."""
    return SDFModule(input_dim=input_dim)


class TensorModule(nn.Module):
    """A bare learnable tensor (networks.py:203-214; the upstream class has a
    broken __init__ spelling — semantics preserved, bug not)."""
    shape: Sequence[int]

    @nn.compact
    def __call__(self, x=None):
        return self.param(
            "tensor",
            lambda key, s: jax.random.normal(key, s) / sum(s), tuple(self.shape))


class Upsample(nn.Module):
    """2x nearest upsample + optional 3x3 conv, 2D NHWC (networks.py:216-233)."""
    in_channels: int
    with_conv: bool = True

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        if self.with_conv:
            x = nn.Conv(self.in_channels, (3, 3), padding="SAME",
                        name="conv")(x)
        return x


class Downsample(nn.Module):
    """stride-2 3x3 conv with the reference's asymmetric (0,1) pad, or 2x2
    avg-pool (networks.py:235-255)."""
    in_channels: int
    with_conv: bool = True

    @nn.compact
    def __call__(self, x):
        if self.with_conv:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            return nn.Conv(self.in_channels, (3, 3), strides=(2, 2),
                           padding="VALID", name="conv")(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


# ------------------------------------------------ (A)NP attention variants
class _NPAttention(nn.Module):
    """Base of the per-type (A)NP attention modules (networks.py:457-511):
    optional shared MLP representation of queries/keys, then attend()."""
    rep: str = "mlp"
    hidden_spec: Sequence[int] = (64, 64, 64)
    normalize: bool = True

    def represent(self, q_x, k_x):
        if self.rep == "identity":
            return q_x, k_x
        q = MLP(tuple(self.hidden_spec), name="q_rep")(q_x)
        k = MLP(tuple(self.hidden_spec), name="k_rep")(k_x)
        return q, k

    @nn.compact
    def __call__(self, k_x, q_x, v):
        """k_x (B, n, dx) context inputs, q_x (B, m, dx) targets, v (B, n, d)."""
        q, k = self.represent(q_x, k_x)
        return self.attend(q, k, v)


class UniformAttentionModule(_NPAttention):
    """Mean-pool aggregation (networks.py:513-529)."""

    def attend(self, q, k, v):
        rep = v.mean(axis=1, keepdims=True)
        return jnp.broadcast_to(rep, (q.shape[0], q.shape[1], v.shape[-1]))


class LaplaceAttentionModule(_NPAttention):
    """L1-kernel attention (networks.py:535-564)."""
    scale: float = 1.0

    def attend(self, q, k, v):
        w = -jnp.abs((k[:, None, :, :] - q[:, :, None, :]) / self.scale)
        w = w.sum(axis=-1)                                  # (B, m, n)
        w = (jax.nn.softmax(w, axis=-1) if self.normalize
             else 1.0 + jnp.tanh(w))
        return jnp.einsum("bmn,bnd->bmd", w, v)


class DotProductAttentionModule(_NPAttention):
    """Scaled dot-product attention (networks.py:566-592)."""

    def attend(self, q, k, v):
        w = jnp.einsum("bnk,bmk->bmn", k, q) / jnp.sqrt(q.shape[-1])
        w = jax.nn.softmax(w, axis=-1) if self.normalize else nn.sigmoid(w)
        return jnp.einsum("bmn,bnd->bmd", w, v)


class MultiheadAttentionModule(_NPAttention):
    """Multi-head dot-product variant (networks.py:603-644)."""
    num_heads: int = 8

    @nn.compact
    def __call__(self, k_x, q_x, v):
        q, k = self.represent(q_x, k_x)
        d_v = v.shape[-1]
        d_head = max(d_v // self.num_heads, 1)
        out = 0.0
        for h in range(self.num_heads):
            qh = nn.Dense(d_head, use_bias=False, name=f"WqH{h}")(q)
            kh = nn.Dense(d_head, use_bias=False, name=f"WkH{h}")(k)
            vh = nn.Dense(d_head, use_bias=False, name=f"WvH{h}")(v)
            w = jnp.einsum("bnk,bmk->bmn", kh, qh) / jnp.sqrt(d_head)
            w = jax.nn.softmax(w, axis=-1)
            o = jnp.einsum("bmn,bnd->bmd", w, vh)
            out = out + nn.Dense(d_v, use_bias=False, name=f"WoH{h}")(o)
        return out


def get_attention(dim_x, dim_hidden, attentionType="uniform",
                  attentionRep="mlp"):
    """Factory (networks.py:646-666)."""
    kw = dict(rep=attentionRep, hidden_spec=(dim_hidden,) * 3)
    if attentionType == "uniform":
        return UniformAttentionModule(**kw)
    if attentionType == "laplace":
        return LaplaceAttentionModule(**kw, scale=1.0)
    if attentionType == "dot_product":
        return DotProductAttentionModule(**kw)
    if attentionType == "multihead":
        return MultiheadAttentionModule(**kw, num_heads=8)
    raise NameError(attentionType)


class LatentEncoder(nn.Module):
    """(A)NP latent encoder -> (mu, sigma) of the global latent
    (networks.py:710-772); distributions stay explicit tuples in jax."""
    spec: Sequence[int]
    dim_latent: int

    @nn.compact
    def __call__(self, x, y):
        h = MLP(tuple(self.spec), name="input_mlp")(
            jnp.concatenate([x, y], axis=-1))
        h = h.mean(axis=1)
        h = MLP((self.spec[-1], self.spec[-1], 2 * self.dim_latent),
                name="mu_sigma_mlp")(h)
        mu = h[..., :self.dim_latent] * 0.1
        sigma = 0.01 + 0.99 * nn.sigmoid(h[..., self.dim_latent:])
        return mu, sigma


class Decoder(nn.Module):
    """(A)NP decoder -> per-target (mu, sigma) (networks.py:773-845; the
    upstream class is syntactically dead — forward nested inside __init__,
    undefined names — re-implemented to its evident intent)."""
    dim_hidden: int
    dim_out: int = 1
    min_std: float = 0.01

    @nn.compact
    def __call__(self, representation, target_x):
        h = MLP((self.dim_hidden, self.dim_hidden), name="mlp")(
            jnp.concatenate([target_x, representation], axis=-1))
        mu = MLP((self.dim_hidden,) * 2 + (self.dim_out,), name="mu_mlp")(h)
        log_sigma = MLP((self.dim_hidden,) * 2 + (self.dim_out,),
                        name="std_mlp")(h)
        sigma = self.min_std + (1 - self.min_std) * nn.softplus(log_sigma)
        return mu, sigma


class ImplicitDecoder(nn.Module):
    """Conditioned implicit decoder: concat(latent, query) -> ImplicitModule
    (networks.py:846-921)."""
    dim_latent: int
    dim_out: int = 1
    latent_dim: int = 512
    activation: str = "softplus"

    @nn.compact
    def __call__(self, representation, target_x):
        if representation.ndim == 2:
            representation = jnp.broadcast_to(
                representation[:, None, :],
                (target_x.shape[0], target_x.shape[1],
                 representation.shape[-1]))
        x = jnp.concatenate([target_x, representation], axis=-1)
        return ImplicitModule(hidden=self.latent_dim, out_dim=self.dim_out,
                              name="net")(x)
