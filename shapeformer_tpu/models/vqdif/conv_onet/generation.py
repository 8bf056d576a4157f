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
        self.refinement_step = int(refinement_step or 0)
        self.simplify_nfaces = simplify_nfaces
        self._eval = None
        self._refine = {}

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

    def refine_vertices(self, vert, grid_feat, steps=None, eps=1e-8):
        """Gradient refinement (reference generation.py:454-474): project
        each vertex onto the decoder's iso-surface with Newton steps along
        the field gradient, v <- v - (f(v) - logit(tau)) * grad / |grad|^2.

        The reference runs an Adam loop over vertex positions with a normal-
        alignment term; Newton projection reaches the same fixed point
        (f(v) = logit(tau)) in 2-3 steps on device with no optimizer state.
        """
        steps = self.refinement_step if steps is None else int(steps)
        if steps <= 0 or len(vert) == 0:
            return np.asarray(vert, np.float32)
        tau = min(max(float(self.threshold), 1e-5), 1 - 1e-5)
        logit_tau = float(np.log(tau / (1.0 - tau)))
        M = len(vert)
        # pad to a power-of-two bucket (min 4096) so meshes of nearby sizes
        # share one compiled program — per-4096 buckets compiled a fresh
        # trace per distinct mesh size and the cache grew without bound
        padded = 4096
        while padded < M:
            padded *= 2
        pts = np.concatenate([np.asarray(vert, np.float32),
                              np.zeros((padded - M, 3), np.float32)])
        key = (pts.shape[0], steps)
        if key not in self._refine:
            def run(variables, grid_feat, pts):
                processed = self.model.apply(
                    variables, grid_feat,
                    method=lambda m, g: m.decoder.process_grid(g))

                def field_sum(p):
                    lg = self.model.apply(
                        variables, p[None] / 2.0, processed,
                        method=lambda m, q, g: m.decoder.query(q, g))
                    lg = lg.reshape(-1).astype(jnp.float32)
                    return lg.sum(), lg

                def body(p, _):
                    (_, lg), g = jax.value_and_grad(
                        field_sum, has_aux=True)(p)
                    denom = (g * g).sum(-1, keepdims=True) + eps
                    p = p - (lg - logit_tau)[:, None] * g / denom
                    return jnp.clip(p, -1.0, 1.0), None

                p, _ = jax.lax.scan(body, pts, None, length=steps)
                return p
            self._refine[key] = jax.jit(run)
        out = np.asarray(self._refine[key](self.variables, grid_feat,
                                           jnp.asarray(pts)))
        return out[:M]

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
        if self.simplify_nfaces:    # QEM edge collapse (ref :414-416)
            vert, face = geoutil.decimate(vert, face,
                                          int(self.simplify_nfaces))
        if self.refinement_step > 0:   # iso-surface projection (ref :454-474)
            vert = self.refine_vertices(vert, encoded["quant_feat"])
        stats = {"time (generate)": time.time() - t0,
                 "resolution": self.resolution,
                 "n_faces": int(len(face))}
        return (vert, face, stats) if return_stats else (vert, face)
