"""Mesh generation pipeline over an implicit occupancy model.

Component parity with shapeformer/models/vqdif/conv_onet/generation.py:17-515
(the ConvONet Generator3D; vestigial in the reference — SURVEY.md section 2.1
row 38).  TPU-native redesign: instead of MISE's octree refinement (a
host-side data-dependent loop), occupancy is evaluated densely at
`resolution0 * 2^upsampling_steps` with fixed-size query tiles jit-mapped on
device, then meshed with the first-party C++ marching-tets kernel — dense
batched evaluation at 128^3-256^3 saturates the MXU and is faster end-to-end
on TPU than adaptive refinement with per-level host sync.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ....utils import geoutil
from ....utils.nputil import makeGrid, sigmoid


class Generator3D:
    """generate_mesh(batch) -> (vert, face, stats) like the reference class
    (generation.py:17-130 interface: threshold, resolution0,
    upsampling_steps, points_batch_size, refinement/simplification knobs)."""

    def __init__(self, model, variables, points_batch_size=100000,
                 threshold=0.5, resolution0=32, upsampling_steps=2,
                 padding=0.1, refinement_step=0, simplify_nfaces=None,
                 device=None, **unused):
        self.model, self.variables = model, variables
        self.points_batch_size = int(points_batch_size)
        self.threshold = threshold
        self.resolution = resolution0 * (2 ** upsampling_steps)
        self._eval = None

    def _build(self, grid_feat_shape):
        res = self.resolution
        coords = makeGrid([-1, -1, -1.0], [1.0, 1, 1], [res] * 3,
                          indexing="ij").astype(np.float32)
        n = coords.shape[0]
        chunk = self.points_batch_size
        chunk = max(1, n // max(1, n // chunk))      # even tiling
        while n % chunk:
            chunk -= 1
        self._coords = coords
        self._chunk = chunk

        def fn(variables, grid_feat):
            from ..vqdif import VQDIF
            processed = self.model.apply(
                variables, grid_feat,
                method=lambda m, g: m.decoder.process_grid(g))
            tiles = jnp.asarray(coords).reshape(n // chunk, 1, chunk, 3)
            logits = jax.lax.map(
                lambda t: self.model.apply(
                    variables, t / 2.0, processed,
                    method=lambda m, p, g: m.decoder.query(p, g)), tiles)
            return logits.reshape(-1)
        self._eval = jax.jit(fn)

    def eval_points(self, grid_feat):
        """Dense occupancy logits over the full generation grid."""
        if self._eval is None:
            self._build(grid_feat.shape)
        return self._eval(self.variables, grid_feat)

    def generate_mesh(self, batch, return_stats=True):
        from ..vqdif import VQDIF
        t0 = time.time()
        Xbd = jnp.asarray(batch["Xbd"])
        encoded = self.model.apply(self.variables, Xbd,
                                   method=VQDIF.encode_quant)
        logits = np.asarray(self.eval_points(encoded["quant_feat"]))
        occ = sigmoid(logits)
        vert, face = geoutil.array2mesh(occ, thresh=self.threshold,
                                        coords=self._coords)
        stats = {"time (generate)": time.time() - t0,
                 "resolution": self.resolution,
                 "n_faces": int(len(face))}
        return (vert, face, stats) if return_stats else (vert, face)
