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


def sample_ranked(key, logits, top_k: int = 0, top_p: float = 0.0,
                  temperature: float = 1.0, best_in_first: bool = False,
                  best_rows=None):
    """Filter + sample + log-prob in one pass, compressed to the top-k set.

    Distributionally identical to `sample_logits` followed by `log_prob_of`
    on the filtered logits, but when top_k is set every post-top_k op
    (nucleus mask, Gumbel noise, argmax, log-normalization) runs on the
    (B, k) compressed arrays instead of (B, V) — on the flagship decode
    step (V=4097, k=100, twice per token) the full-vocab elementwise ops
    were 0.40 ms of the 1.5 ms step (bench.py AR breakdown).  Trajectories
    for a fixed key differ from `sample_logits` (Gumbel noise is drawn over
    k instead of V entries); only the distribution is preserved.  Boundary
    behavior: exact ties AT the k-th logit are dropped rather than kept —
    measure-zero for real float logits.

    best_in_first replaces row 0's draw with its argmax (the reference's
    deterministic first candidate, shapeformer.py:234); best_rows, a (B,)
    bool mask, generalizes it to any set of rows (the first candidate of
    EVERY condition in a tiled multi-shape batch — complete_many).  When
    best_rows is given it takes precedence over best_in_first.

    The returned log-prob is p(token) under the UNSCALED input distribution
    (pre-top-k/top-p, no temperature) — the reference's ranking key is
    computed from the masked logits history (compute_log_probs,
    shapeformer.py:407-418), not the truncated sampling distribution.  That
    costs one full-vocab logsumexp reduction + a 1-element gather; the
    (B, V)-shaped log_softmax/Gumbel/argmax materializations are what the
    compressed path eliminates.
    Returns ((B,) int32 tokens, (B,) log p(token)).
    """
    raw = logits.astype(jnp.float32)
    logits = raw / temperature
    V = logits.shape[-1]
    lse = jax.scipy.special.logsumexp(raw, axis=-1)
    if top_k and top_k > 0:
        k = min(int(top_k), V)
        topv, topi = jax.lax.top_k(logits, k)            # descending values
        if top_p and top_p > 0.0:
            vals = jnp.where(topv < _nucleus_min(topv, top_p), NEG_INF, topv)
        else:
            vals = topv
        g = jax.random.gumbel(key, vals.shape, dtype=vals.dtype)
        sel = jnp.argmax(vals + g, axis=-1)
        if best_rows is not None:
            sel = jnp.where(best_rows, 0, sel)           # topv[0] is the max
        elif best_in_first:
            sel = sel.at[0].set(0)
        tok = jnp.take_along_axis(topi, sel[:, None], axis=-1)[:, 0]
    else:
        filtered = filter_logits(logits, top_k=0, top_p=top_p,
                                 temperature=1.0)
        tok = sample_categorical(key, filtered)
        if best_rows is not None:
            tok = jnp.where(best_rows,
                            jnp.argmax(filtered, axis=-1).astype(jnp.int32),
                            tok)
        elif best_in_first:
            tok = tok.at[0].set(jnp.argmax(filtered[0]).astype(jnp.int32))
    chosen = jnp.take_along_axis(raw, tok[:, None].astype(jnp.int32),
                                 axis=-1)[:, 0]
    return tok.astype(jnp.int32), chosen - lse
