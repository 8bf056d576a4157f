"""2D raster-order permuters for token sequences.

Semantics parity with shapeformer/models/shapeformer/transformer/
permuter.py:6-233 (the taming-transformers orderings; NOT used by the 3D
pipeline — SURVEY.md section 2.1 row 28 — provided for component parity).
Each permuter maps a raster-ordered (B, H*W) token sequence to/from its
ordering; implemented as precomputed index permutations applied with jnp.take.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class AbstractPermuter:
    def __init__(self, H: int, W: int):
        self.H, self.W = H, W
        self.forward_ind = self._build()          # new[i] = raster[fwd[i]]
        self.backward_ind = np.argsort(self.forward_ind)

    def _build(self) -> np.ndarray:
        raise NotImplementedError

    def __call__(self, x, reverse: bool = False):
        idx = self.backward_ind if reverse else self.forward_ind
        return jnp.take(x, jnp.asarray(idx), axis=1)


class Identity(AbstractPermuter):
    def _build(self):
        return np.arange(self.H * self.W)


class Subsample(AbstractPermuter):
    """Coarse-to-fine: power-of-two subsampled grids emitted coarse first."""

    def _build(self):
        H, W = self.H, self.W
        raster = np.arange(H * W).reshape(H, W)
        seen = np.zeros((H, W), bool)
        order = []
        step = max(H, W)
        while step >= 1:
            for i in range(0, H, step):
                for j in range(0, W, step):
                    if not seen[i, j]:
                        order.append(raster[i, j])
                        seen[i, j] = True
            step //= 2
        return np.array(order)


class ZCurve(AbstractPermuter):
    def _build(self):
        from ....utils.nputil import ravel_index_zorder
        H, W = self.H, self.W
        depth = int(np.ceil(np.log2(max(H, W))))
        ij = np.stack(np.meshgrid(np.arange(H), np.arange(W),
                                  indexing="ij"), -1).reshape(-1, 2)
        codes = ravel_index_zorder(ij, depth=depth)
        return np.argsort(codes, kind="stable")


class SpiralOut(AbstractPermuter):
    """Center-out clockwise spiral."""

    def _build(self):
        H, W = self.H, self.W
        i, j = H // 2, W // 2
        order, seen = [], set()

        def visit(a, b):
            if 0 <= a < H and 0 <= b < W and (a, b) not in seen:
                seen.add((a, b))
                order.append(a * W + b)
        visit(i, j)
        step = 1
        while len(order) < H * W:
            for di, dj, n in [(0, 1, step), (1, 0, step),
                              (0, -1, step + 1), (-1, 0, step + 1)]:
                for _ in range(n):
                    i, j = i + di, j + dj
                    visit(i, j)
            step += 2
        return np.array(order)


class SpiralIn(AbstractPermuter):
    def _build(self):
        return SpiralOut(self.H, self.W).forward_ind[::-1].copy()


class Random(AbstractPermuter):
    def __init__(self, H, W, seed: int = 1):
        self.seed = seed
        super().__init__(H, W)

    def _build(self):
        rng = np.random.default_rng(self.seed)
        return rng.permutation(self.H * self.W)


class AlternateParsing(AbstractPermuter):
    """Boustrophedon rows: left-to-right, then right-to-left."""

    def _build(self):
        raster = np.arange(self.H * self.W).reshape(self.H, self.W)
        raster[1::2] = raster[1::2, ::-1]
        return raster.reshape(-1)
