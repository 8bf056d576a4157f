"""Partial-cloud selectors: synthesize partial observations of a shape.

Semantics parity with shapeformer/data/partial.py:28-331, pure numpy:
  AllSelector / BallSelector / MultiBallSelector / VirtualScanSelector /
  OrthoVirtualScanSelector / CamVirtualScanSelector / fixedVirtualScanSelector /
  HalfSpaceSelector / MixSelector_fixed1 / NoneSelector.
Each selector is a callable Xbd (N, 3) -> Xct (context_N, 3).
"""
from __future__ import annotations

import numpy as np

from ..utils import geoutil


def _subsample(Xct, context_N, rng):
    if context_N is not None and context_N >= 0:
        choice = rng.integers(0, Xct.shape[0], context_N)
        Xct = Xct[choice]
    return Xct


def _add_noise(Xct, noise, rng):
    if noise > 0:
        Xct = (Xct + rng.normal(size=Xct.shape) * noise).clip(-1.0, 1.0)
    return Xct


class AllSelector:
    def __init__(self, context_N=None):
        self.context_N = context_N

    def __call__(self, Xbd, rng=None, **kw):
        rng = rng or np.random.default_rng()
        return _subsample(Xbd, self.context_N, rng)


class NoneSelector:
    def __call__(self, Xbd, **kw):
        return np.zeros((0, Xbd.shape[-1]), Xbd.dtype)


class BallSelector:
    """Points within a random ball centered on a surface point
    (partial.py:76-100)."""

    def __init__(self, radius=0.1, context_N=512, noise=0.0, inverse=False):
        self.radius, self.context_N = radius, context_N
        self.noise, self.inverse = noise, inverse

    def __call__(self, Xbd, radius=None, rng=None, **kw):
        rng = rng or np.random.default_rng()
        pivot = Xbd[rng.integers(0, Xbd.shape[0], 1)]
        dist2 = ((Xbd - pivot) ** 2).sum(axis=-1)
        r = self.radius if radius is None else radius
        sel = dist2 < r * r
        if self.inverse:
            sel = ~sel
            if sel.sum() < 400:
                sel = np.ones_like(sel)
        Xct = Xbd[sel]
        if Xct.shape[0] == 0:
            Xct = Xbd
        return _add_noise(_subsample(Xct, self.context_N, rng), self.noise, rng)


class MultiBallSelector:
    def __init__(self, radius_range=(0.05, 0.4), N_range=(1, 3), context_N=512,
                 virtual_scan=False):
        self.radius_range, self.N_range = radius_range, N_range
        self.context_N, self.virtual_scan = context_N, virtual_scan
        self.selector = BallSelector(context_N=context_N)

    def __call__(self, Xbd, rng=None, **kw):
        rng = rng or np.random.default_rng()
        if self.virtual_scan:
            visible = geoutil.hidden_point_removal(
                Xbd, geoutil.sample_sphere(1, rng=rng)[0] * 10)
            if visible.shape[0] > 2:
                Xbd = visible
        n = rng.integers(self.N_range[0], self.N_range[1])
        lo, hi = self.radius_range
        parts = [self.selector(Xbd, radius=lo + rng.random() * (hi - lo),
                               rng=rng) for _ in range(max(n, 1))]
        Xct = np.concatenate(parts, axis=0)
        return _subsample(Xct, self.context_N, rng)


class VirtualScanSelector:
    """Visible points from a random camera on a sphere (partial.py:127-147):
    the main training-time partial-observation model."""

    def __init__(self, radius=10, context_N=512, noise=0.0, manual_cameras=None):
        self.radius, self.context_N, self.noise = radius, context_N, noise

    def __call__(self, Xbd, index=None, rng=None, **kw):
        rng = rng or np.random.default_rng()
        cam = geoutil.sample_sphere(1, rng=rng)[0] * self.radius
        Xct = geoutil.hidden_point_removal(Xbd, cam)
        if Xct.shape[0] <= 2:
            Xct = Xbd
        return _add_noise(_subsample(Xct, self.context_N, rng), self.noise, rng)


class OrthoVirtualScanSelector:
    def __init__(self, radius=10, context_N=512, noise=0.0):
        self.radius, self.context_N, self.noise = radius, context_N, noise

    def __call__(self, Xbd, rng=None, **kw):
        rng = rng or np.random.default_rng()
        axis = rng.integers(0, Xbd.shape[-1])
        direction = rng.integers(0, 2) * 2 - 1
        cam = np.zeros(Xbd.shape[-1])
        cam[axis] = direction * self.radius
        Xct = geoutil.hidden_point_removal(Xbd, cam)
        if Xct.shape[0] <= 2:
            Xct = Xbd
        return _add_noise(_subsample(Xct, self.context_N, rng), self.noise, rng)


class CamVirtualScanSelector:
    def __init__(self, radius=10, context_N=512, noise=0.0):
        self.radius, self.context_N, self.noise = radius, context_N, noise

    def __call__(self, Xbd, camera_pos=None, rng=None, **kw):
        rng = rng or np.random.default_rng()
        Xct = geoutil.hidden_point_removal(Xbd, np.asarray(camera_pos))
        if Xct.shape[0] <= 2:
            Xct = Xbd
        return _add_noise(_subsample(Xct, self.context_N, rng), self.noise, rng)


class fixedVirtualScanSelector:
    def __init__(self, radius=10, context_N=512, noise=0.0):
        self.radius, self.context_N, self.noise = radius, context_N, noise

    def __call__(self, Xbd, rng=None, **kw):
        rng = rng or np.random.default_rng()
        cam = np.array([1.0, 1.0, 1.0]) * self.radius
        Xct = geoutil.hidden_point_removal(Xbd, cam)
        if Xct.shape[0] <= 2:
            Xct = Xbd
        return _add_noise(_subsample(Xct, self.context_N, rng), self.noise, rng)


class HalfSpaceSelector:
    """Keep the half-space side of a plane, by cardinality or by distance
    (partial.py:222-260)."""

    def __init__(self, portion, portion_on="cardinality", context_N=512,
                 plane_normal=(1, 0, 0.0), plane_o=(0, 0, 0.0)):
        self.portion, self.portion_on, self.context_N = \
            portion, portion_on, context_N
        self.plane_o = np.asarray(plane_o, np.float64)
        n = np.asarray(plane_normal, np.float64)
        self.plane_normal = n / np.linalg.norm(n)

    def __call__(self, Xbd, rng=None, **kw):
        rng = rng or np.random.default_rng()
        dist = ((Xbd - self.plane_o) * self.plane_normal).sum(axis=-1)
        if self.portion_on == "cardinality":
            k = int(Xbd.shape[0] * self.portion)
            sel = np.argsort(-dist)[:k]
        elif self.portion_on == "distance":
            thr = (dist.max() - dist.min()) * self.portion + dist.min()
            sel = np.where(dist >= thr)[0]
        else:
            raise ValueError(self.portion_on)
        if sel.shape[0] > 0:
            sel = sel[rng.integers(0, sel.shape[0], self.context_N)]
        return Xbd[sel]


class MixSelector_fixed1:
    """Random mixture of scan styles per call (partial.py:148-160)."""

    def __init__(self, context_N=512):
        self.selectors = [VirtualScanSelector(context_N=context_N),
                          OrthoVirtualScanSelector(context_N=context_N),
                          AllSelector(context_N=context_N),
                          MultiBallSelector(context_N=context_N)]

    def __call__(self, Xbd, rng=None, **kw):
        rng = rng or np.random.default_rng()
        return self.selectors[rng.integers(0, len(self.selectors))](Xbd, rng=rng)
