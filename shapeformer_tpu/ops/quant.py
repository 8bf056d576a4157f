"""Weight-only int8 quantization for serving (opt-in).

The AR decode loop is HBM-bound: every step streams every transformer weight
once (SURVEY.md section 6 cost structure; bench.py phase table).  Storing
Dense kernels as int8 with per-output-channel f32 scales halves that stream;
XLA fuses the int8->bf16 convert into the dot, so no dequantized copy is
materialized.  Embeddings, norms, biases and positional tables stay in f32 —
they are gathered or tiny.

Usage:
  model  = CondTupleGPT(..., quant_dense=True)
  qparams = quantize_tree(params)     # from a trained f32/bf16 checkpoint
  model.apply(qparams, ...)           # same call surface

Training always runs unquantized; this is an inference-path transform (the
reference has no quantized path — this is a rebuild extension for TPU
serving).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

QUANT_MAX = 127.0


class QuantDense(nn.Module):
    """Drop-in nn.Dense with an int8 kernel + per-column scale."""
    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", lambda *_: jnp.zeros((x.shape[-1], self.features),
                                           jnp.int8))
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        x = x.astype(self.dtype)
        y = jnp.dot(x, kernel.astype(self.dtype))
        y = y * scale.astype(self.dtype)[None, :]
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(self.dtype)
        return y


def make_dense(quant: bool, features: int, use_bias: bool = True,
               dtype=jnp.float32, name=None):
    """Factory the transformer modules use to pick Dense vs QuantDense."""
    if quant:
        return QuantDense(features, use_bias=use_bias, dtype=dtype, name=name)
    return nn.Dense(features, use_bias=use_bias, dtype=dtype, name=name)


def quantize_kernel(w):
    """(in, out) float kernel -> (int8 kernel, (out,) f32 scale)."""
    w = jnp.asarray(w, jnp.float32)
    scale = jnp.maximum(jnp.abs(w).max(axis=0), 1e-8) / QUANT_MAX
    q = jnp.clip(jnp.round(w / scale[None, :]), -QUANT_MAX, QUANT_MAX)
    return q.astype(jnp.int8), scale


def quantize_tree(params):
    """Quantize every 2D 'kernel' leaf of a param pytree, inserting a sibling
    'scale' leaf — produces the structure QuantDense expects.  1D/embedding
    leaves pass through unchanged (cast to f32 for scales/bias math)."""
    def walk(tree):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                if "kernel" in v and getattr(v["kernel"], "ndim", 0) == 2:
                    q, scale = quantize_kernel(v["kernel"])
                    new = {"kernel": q, "scale": scale}
                    for extra_k, extra_v in v.items():
                        if extra_k != "kernel":
                            new[extra_k] = jnp.asarray(extra_v, jnp.float32)
                    out[k] = new
                else:
                    out[k] = walk(v)
            else:
                out[k] = v
        return out
    return walk(params)
