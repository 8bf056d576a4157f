"""EMA vector quantizer as pure-functional flax state.

Semantics parity with shapeformer/models/vqdif/quantizer.py:5-89:
  - nearest-codebook assignment by expanded L2 distance (a single
    (B*cells, C) x (C, vocab) matmul -> MXU);
  - straight-through estimator for the encoder gradient;
  - EMA codebook update (gamma=0.99) with Laplace-smoothed counts, done
    in-forward during training.
The reference mutates buffers in place (quantizer.py:71-83); under jit the
codebook / N / z_avg live in a separate 'vq' variable collection threaded
through the train step (SURVEY.md section 7 'hard parts').  Under pjit data
parallelism the EMA statistics are computed over the *global* batch, which
fixes the reference's per-rank-divergent ddp behavior.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class Quantizer(nn.Module):
    vocab_size: int
    n_embd: int
    gamma: float = 0.99
    x_dim: int = 3  # kept for config-surface parity; layout is channels-last

    def setup(self):
        init = nn.initializers.normal(stddev=0.02)
        self.codebook = self.variable(
            "vq", "codebook",
            lambda: init(self.make_rng("params"), (self.vocab_size, self.n_embd)))
        self.ema_count = self.variable(
            "vq", "N", lambda: jnp.zeros((self.vocab_size,), jnp.float32))
        self.ema_avg = self.variable(
            "vq", "z_avg", lambda: jnp.array(self.codebook.value))

    def get_code(self, ind):
        """(B, r, r, r) indices -> (B, r, r, r, C) codebook features."""
        return jnp.take(self.codebook.value, ind, axis=0)

    def __call__(self, grid_feat, train: bool = False, row_weight=None):
        """(B, r, r, r, C) -> (quant_feat, quant_feat_st, indices, quant_diff).

        row_weight: optional (B,) 0/1 weights — rows duplicated by dp batch
        padding (systems._mesh_batch) carry weight 0 so they bias neither
        the commitment loss nor the EMA codebook statistics."""
        B = grid_feat.shape[0]
        C = self.n_embd
        flat = grid_feat.reshape(-1, C).astype(jnp.float32)
        w_flat = None
        if row_weight is not None:
            w_flat = jnp.broadcast_to(
                row_weight.astype(jnp.float32).reshape(
                    (B,) + (1,) * (grid_feat.ndim - 2)),
                grid_feat.shape[:-1]).reshape(-1)
        weight = self.codebook.value.astype(jnp.float32)          # (V, C)
        # ||z - e||^2 expanded; argmin == argmax of -distance
        dist = ((flat ** 2).sum(-1, keepdims=True)
                - 2.0 * flat @ weight.T
                + (weight ** 2).sum(-1)[None, :])                  # (N, V)
        ind_flat = jnp.argmin(dist, axis=-1)                       # (N,)
        indices = ind_flat.reshape(grid_feat.shape[:-1])
        quant_feat = jnp.take(weight, ind_flat, axis=0).reshape(grid_feat.shape)

        if train and self.is_mutable_collection("vq"):
            onehot = jax.nn.one_hot(ind_flat, self.vocab_size, dtype=jnp.float32)
            if w_flat is not None:
                onehot = onehot * w_flat[:, None]
            counts = onehot.sum(0)                                 # (V,)
            encode_sum = flat.T @ onehot                           # (C, V)
            g = self.gamma
            new_N = self.ema_count.value * g + (1 - g) * counts
            new_avg = self.ema_avg.value * g + (1 - g) * encode_sum.T
            n = new_N.sum()
            weights = (new_N + 1e-7) / (n + self.vocab_size * 1e-7) * n
            self.ema_count.value = new_N
            self.ema_avg.value = new_avg
            self.codebook.value = new_avg / weights[:, None]

        quant_feat = quant_feat.astype(grid_feat.dtype)
        quant_feat_st = grid_feat + jax.lax.stop_gradient(quant_feat - grid_feat)
        d = (grid_feat - jax.lax.stop_gradient(quant_feat)) ** 2
        if row_weight is not None:
            per_row = d.reshape(B, -1).mean(axis=1)
            w = row_weight.astype(per_row.dtype)
            quant_diff = (per_row * w).sum() / jnp.maximum(w.sum(), 1.0)
        else:
            quant_diff = d.mean()
        return quant_feat, quant_feat_st, indices, quant_diff
