"""Vectorized logit filtering + categorical sampling for AR decode.

Replaces the reference's per-row python loop (shapeformer/models/shapeformer/
common.py:260-299: filter_sampling_logits + torch.multinomial) with fully
batched top-k / top-p masking and Gumbel-max sampling, all jit/scan safe.

Filter order matches the reference exactly: temperature scale -> top-k
threshold -> top-p (nucleus) on the already-filtered logits, keeping at least
the single best token.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-1e30)  # finite stand-in for -inf (safe under softmax)


def _nucleus_min(sorted_desc, top_p):
    """Smallest kept logit of a descending-sorted row under nucleus top_p."""
    cum = jnp.cumsum(jax.nn.softmax(sorted_desc, axis=-1), axis=-1)
    # shift right: always keep the first token above the threshold
    remove_sorted = jnp.concatenate(
        [jnp.zeros_like(cum[..., :1], bool), (cum > top_p)[..., :-1]], axis=-1)
    # token is removed iff its logit is strictly below the smallest kept
    # sorted logit; ties share fate with the kept copy (same prob mass)
    return jnp.min(jnp.where(remove_sorted, jnp.inf, sorted_desc),
                   axis=-1, keepdims=True)


def filter_logits(logits, top_k: int = 0, top_p: float = 0.0,
                  temperature: float = 1.0):
    """(B, V) logits -> filtered (B, V) logits (masked entries = NEG_INF)."""
    logits = logits.astype(jnp.float32) / temperature
    V = logits.shape[-1]
    if top_k and top_k > 0:
        k = min(int(top_k), V)
        # one top_k serves both filters: the k-th value is the top-k cutoff,
        # and (because everything below it is already NEG_INF) the nucleus
        # scan only needs these k descending values — no full-vocab sort.
        topv = jax.lax.top_k(logits, k)[0]
        logits = jnp.where(logits < topv[..., -1:], NEG_INF, logits)
        if top_p and top_p > 0.0:
            logits = jnp.where(logits < _nucleus_min(topv, top_p),
                               NEG_INF, logits)
    elif top_p and top_p > 0.0:
        sorted_desc = jnp.sort(logits, axis=-1)[..., ::-1]
        logits = jnp.where(logits < _nucleus_min(sorted_desc, top_p),
                           NEG_INF, logits)
    return logits


def sample_categorical(key, logits):
    """(B, V) logits -> (B,) samples via Gumbel-max (== multinomial on softmax)."""
    g = jax.random.gumbel(key, logits.shape, dtype=logits.dtype)
    return jnp.argmax(logits + g, axis=-1).astype(jnp.int32)


def sample_logits(key, logits, top_k: int = 0, top_p: float = 0.0,
                  temperature: float = 1.0):
    """Filter then sample; returns ((B,) token ids, (B, V) filtered logits)."""
    filtered = filter_logits(logits, top_k=top_k, top_p=top_p,
                             temperature=temperature)
    return sample_categorical(key, filtered), filtered


def log_prob_of(logits, tokens):
    """(B, V) raw/filtered logits, (B,) token ids -> (B,) log p(token)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(logp, tokens[:, None].astype(jnp.int32),
                               axis=-1)[:, 0]
