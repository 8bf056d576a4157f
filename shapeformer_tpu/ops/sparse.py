"""Sparse VQ-token codec: dense index grids <-> padded (pos, val) tuple sequences.

This is the jit-safe, static-shape redesign of the reference codec
(shapeformer/models/shapeformer/common.py:84-207).  The reference pipeline is
dense -> packed (K,3) triples -> padded (B, Lmax_dynamic, 2); under XLA every
shape must be static, so here sequences are always padded to a fixed
`max_length` with `end_tokens`, and the dynamic ops (torch.mode, nonzero,
unique_consecutive) become bincount-argmax and cumsum-scatter.

Padding semantics (verified against common.py:84-123 + unpack truncation):
  - tokens appear in ascending flat-position order (the dense scan order);
  - every row ends with at least one (end_pos, end_val) token;
  - rows with >= max_length non-empty cells keep their first max_length-1
    tokens and are terminated at column max_length-1.
The reference trains with per-batch dynamic padding (counts.max()+1); with
batch size 1 (the shipped transformer config) that equals "tokens + exactly
one end token", which is what a loss built with `token_mask` reproduces here
for any batch size.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------- device
def get_mode(vals, vocab_size: int):
    """Mode of an integer array (the 'empty cell' codebook index).

    Replaces torch.mode (common.py:155) with a static-shape bincount argmax.
    Ties break toward the smallest index, matching torch.mode.
    """
    counts = jnp.bincount(vals.reshape(-1), length=vocab_size)
    return jnp.argmax(counts).astype(jnp.int32)


def dense2sparse(dense, max_length: int, end_tokens, vocab_size: int, mode=None):
    """(B, r, r, r) CANONICAL-layout int grid -> ((B, max_length, 2) int32
    sequence, mode).

    Cells whose value equals the batch mode are treated as empty and dropped
    (mode-as-empty convention, common.py:151-168).

    Token numbering/order follows the REFERENCE's convention exactly: flat
    position ids are the raster scan of the reference's (s0, s1, s2) grid
    (batch_dense2sparse flattens quant_ind directly, common.py:151-168).
    This framework's canonical grid layout keeps those spatial axes REVERSED
    (convert.py:10-13), so the codec transposes at its boundary — making
    tokenize output byte-identical to the reference pipeline's, which is what
    converted reference transformer checkpoints were trained on (pinned in
    tests/test_demo_golden.py on the reference's real demo scans).
    """
    B = dense.shape[0]
    if dense.ndim == 4:
        dense = jnp.transpose(dense, (0, 3, 2, 1))
    flat = dense.reshape(B, -1).astype(jnp.int32)
    n_cells = flat.shape[1]
    if mode is None:
        mode = get_mode(flat, vocab_size)
    keep = flat != mode                                     # (B, n_cells)
    slot = jnp.cumsum(keep, axis=1) - 1                     # target column
    count = keep.sum(axis=1)                                # tokens per row
    valid = keep & (slot < max_length)
    # dump invalid entries into a scratch column that is sliced off
    tgt = jnp.where(valid, slot, max_length)
    pos_ids = jnp.broadcast_to(jnp.arange(n_cells, dtype=jnp.int32)[None], flat.shape)
    e0, e1 = int(end_tokens[0]), int(end_tokens[1])
    out_pos = jnp.full((B, max_length + 1), e0, jnp.int32).at[
        jnp.arange(B)[:, None], tgt].set(jnp.where(valid, pos_ids, e0))[:, :max_length]
    out_val = jnp.full((B, max_length + 1), e1, jnp.int32).at[
        jnp.arange(B)[:, None], tgt].set(jnp.where(valid, flat, e1))[:, :max_length]
    # rows that overflow are terminated at the last column
    overflow = count >= max_length
    out_pos = out_pos.at[:, max_length - 1].set(
        jnp.where(overflow, e0, out_pos[:, max_length - 1]))
    out_val = out_val.at[:, max_length - 1].set(
        jnp.where(overflow, e1, out_val[:, max_length - 1]))
    return jnp.stack([out_pos, out_val], axis=-1), mode


def sparse2dense(seq, empty_ind, reso: int):
    """(B, L, 2) padded sequence -> (B, r, r, r) dense index grid.

    Inverse of dense2sparse; end/invalid tokens are ignored
    (batch_sparse2dense, common.py:171-189).

    TPU note: implemented as a one-hot matmul (MXU) instead of an index
    scatter — XLA serializes duplicate-capable scatters on TPU (a (8, 406)
    scatter cost ~0.18 s on v5e; the matmul is sub-millisecond).  Values are
    exact in f32 (codebook ids << 2^24); duplicate positions sum, but
    dense2sparse never emits duplicates.
    """
    B, L, _ = seq.shape
    n_cells = reso ** 3
    pos, val = seq[..., 0], seq[..., 1]
    valid = (pos >= 0) & (pos < n_cells)
    safe_pos = jnp.where(valid, pos, 0)
    onehot = jax.nn.one_hot(safe_pos, n_cells, dtype=jnp.float32)
    onehot = onehot * valid[..., None].astype(jnp.float32)   # (B, L, cells)
    summed = jnp.einsum("blc,bl->bc", onehot,
                        jnp.where(valid, val, 0).astype(jnp.float32))
    occupied = jnp.einsum("blc->bc", onehot) > 0.5
    empty = jnp.broadcast_to(jnp.asarray(empty_ind, jnp.float32), (B,))
    dense = jnp.where(occupied, summed, empty[:, None])
    dense = jnp.round(dense).astype(jnp.int32).reshape(B, reso, reso, reso)
    # position ids are reference-raster (see dense2sparse); transpose the
    # reference-layout cube back to the canonical reversed-axis layout
    return jnp.transpose(dense, (0, 3, 2, 1))


def _is_end(seq, end_tokens):
    """(B, L, tuple_n) -> (B, L) bool: every element equals its end token
    (works for any tuple_n, e.g. AU's (z, y, x, val) 4-tuples)."""
    out = jnp.ones(seq.shape[:-1], bool)
    for i in range(min(seq.shape[-1], len(end_tokens))):
        out &= seq[..., i] == end_tokens[i]
    return out


def token_mask(seq, end_tokens):
    """(B, L, tuple_n) -> (B, L) float mask: 1.0 up to and including the FIRST
    end token of each row, 0.0 after.  Used to weight the transformer CE loss
    so fixed-length padding reproduces the reference's dynamic-padding loss."""
    is_end = _is_end(seq, end_tokens)
    # position of first end token (L if none)
    after_first_end = jnp.cumsum(is_end.astype(jnp.int32), axis=1) - is_end.astype(jnp.int32)
    return (after_first_end == 0).astype(jnp.float32)


def seq_lengths(seq, end_tokens):
    """Number of real (non-end) tokens per row."""
    is_end = _is_end(seq, end_tokens)
    return jnp.argmax(
        jnp.concatenate([is_end, jnp.ones((seq.shape[0], 1), bool)], axis=1), axis=1)


# ----------------------------------------------------------------------- host
def filter_end_tokens(tokens: np.ndarray, end_tokens) -> np.ndarray:
    """(L, tuple_n) -> rows where not every element equals its end token
    (common.py:50-55)."""
    end = np.asarray(end_tokens)[None, :]
    return tokens[~(tokens == end).all(axis=1)]


def np_dense2sparse(dense: np.ndarray, max_length: int, end_tokens):
    """Host twin of dense2sparse (numpy, for callbacks / data inspection).
    Same reference-raster token numbering (see dense2sparse)."""
    dense = np.asarray(dense)
    B = dense.shape[0]
    if dense.ndim == 4:
        dense = np.transpose(dense, (0, 3, 2, 1))
    flat = dense.reshape(B, -1).astype(np.int64)
    vals, counts = np.unique(flat, return_counts=True)
    mode = int(vals[np.argmax(counts)])
    out = np.full((B, max_length, 2), -1, np.int64)
    out[..., 0], out[..., 1] = end_tokens[0], end_tokens[1]
    for b in range(B):
        nz = np.where(flat[b] != mode)[0]
        k = min(len(nz), max_length - 1)
        out[b, :k, 0] = nz[:k]
        out[b, :k, 1] = flat[b][nz[:k]]
    return out, mode


def np_sparse2dense(seq: np.ndarray, empty_ind: int, reso: int) -> np.ndarray:
    seq = np.asarray(seq)
    B = seq.shape[0]
    dense = np.full((B, reso ** 3), empty_ind, np.int64)
    for b in range(B):
        pos, val = seq[b, :, 0], seq[b, :, 1]
        ok = (pos >= 0) & (pos < reso ** 3)
        dense[b, pos[ok]] = val[ok]
    # reference-raster ids -> canonical reversed-axis layout (see dense2sparse)
    return dense.reshape(B, reso, reso, reso).transpose(0, 3, 2, 1)


# --------------------------------------------------- reference-order interop
def convonet_to_shapeformer(array: np.ndarray) -> np.ndarray:
    """Swap the reference's (z,y,x) grid scan order to (x,y,z)
    (common.py:67-74).  Only needed when ingesting reference-exported dumps;
    shapeformer_tpu uses one canonical order internally."""
    from ..utils.nputil import array2NDCube
    grid = array2NDCube(np.asarray(array).reshape(-1), N=3)
    return np.swapaxes(grid, 0, -1).reshape(-1)


def sparse_convonet_to_shapeformer(pos_ind: np.ndarray, shape) -> np.ndarray:
    """Re-ravel reference-order flat positions into canonical order
    (common.py:76-80)."""
    inds = np.stack(np.unravel_index(np.asarray(pos_ind), shape), axis=0)
    inds[[0, 1, 2], :] = inds[[2, 1, 0], :]
    return np.ravel_multi_index(inds, shape)
