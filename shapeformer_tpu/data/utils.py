"""Neural-process-style collators (legacy; unused by the shipped configs).

Semantics parity with shapeformer/data/utils.py:4-125 (SURVEY.md section 2.1
row 14): collate a batch of (X, Y) pairs into random-size context/target
splits shared across the batch.
"""
from __future__ import annotations

import numpy as np

from .loader import collate


def _split_counts(total, context_range, target_range, rng):
    c = rng.integers(context_range[0], context_range[1] + 1)
    t = rng.integers(target_range[0], min(target_range[1], total - c) + 1)
    return int(c), int(t)


def NP_collate_fn(items, context_range=(8, 64), target_range=(8, 64),
                  seed=None):
    """Batch items with keys X (N, d_x) / Y (N, d_y) -> dict with context
    (Xct, Yct) and target (Xtg, Ytg) random subsets, sizes shared batch-wide."""
    rng = np.random.default_rng(seed)
    batch = collate(items)
    X, Y = batch["X"], batch["Y"]
    total = X.shape[1]
    c, t = _split_counts(total, context_range, target_range, rng)
    perm = rng.permutation(total)
    ci, ti = perm[:c], perm[c:c + t]
    return dict(Xct=X[:, ci], Yct=Y[:, ci], Xtg=X[:, ti], Ytg=Y[:, ti])


def nnrecon_collate_fn(items, context_range=(0.01, 0.5), seed=None):
    """Reconstruction collator: context is a random fraction of the points,
    the target is every point."""
    rng = np.random.default_rng(seed)
    batch = collate(items)
    X, Y = batch["X"], batch["Y"]
    total = X.shape[1]
    frac = context_range[0] + rng.random() * (context_range[1] - context_range[0])
    ci = rng.permutation(total)[:max(int(total * frac), 1)]
    return dict(Xct=X[:, ci], Yct=Y[:, ci], Xtg=X, Ytg=Y)
