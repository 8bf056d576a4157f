"""TPU-side isosurface extraction (naive surface nets).

Replaces the host marching-tets hot path for the completion pipeline: the
reference runs PyMCubes on CPU over the full grid (xgutils/geoutil.py:199);
here the per-cell work — sign field, edge-crossing interpolation, and the
surface-nets vertex (centroid of the cell's edge crossings) — is a handful of
static-shape elementwise ops that XLA fuses and runs on the accelerator right
after the implicit decode.  Only two small tensors cross to host (the bool
sign grid and quantized per-cell vertices); the host then does a purely
vectorized numpy compaction (cumsum ids + fancy indexing) to build the
indexed mesh.

Output complexity: one vertex per active cell, one quad (two triangles) per
active interior grid edge — about half the triangles of the 6-tet
decomposition (native/marching_tets.cpp) for the same field, with smoother
vertex placement.

Winding convention: triangles are CCW seen from outside (positive signed
volume for a solid with occ > iso inside), matching marching_tets.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

_VQ = 256.0  # vertex quantization: grid coords are stored as uint16 / 256


@functools.partial(jax.jit, static_argnames=("pack",))
def surface_nets_field(occ, iso, pack: bool = True):
    """Device pass: (r,r,r) scalar field -> (sign grid, per-cell vertices).

    Returns
      s     (r,r,r)    bool    occ > iso
      verts (r-1,)*3+(3,)      surface-nets vertex per cell in grid-index
                               coords; uint16 (coord * 256) when pack=True
                               (max grid 255^3), float32 otherwise.
    Inactive cells hold the cell corner (fx=fy=fz=0); the host compaction
    never reads them.
    """
    v = occ.astype(jnp.float32)
    iso = jnp.float32(iso)
    s = v > iso
    nc = v.shape[0] - 1

    def cross(v0, v1):
        d = v1 - v0
        t = (iso - v0) / jnp.where(d == 0, 1.0, d)
        return jnp.clip(t, 0.0, 1.0)

    ex = (s[:-1] ^ s[1:]).astype(jnp.float32)
    ey = (s[:, :-1] ^ s[:, 1:]).astype(jnp.float32)
    ez = (s[:, :, :-1] ^ s[:, :, 1:]).astype(jnp.float32)
    tx = cross(v[:-1], v[1:])
    ty = cross(v[:, :-1], v[:, 1:])
    tz = cross(v[:, :, :-1], v[:, :, 1:])

    cnt = jnp.zeros((nc,) * 3, jnp.float32)
    fx = jnp.zeros_like(cnt)
    fy = jnp.zeros_like(cnt)
    fz = jnp.zeros_like(cnt)
    for da in (0, 1):
        for db in (0, 1):
            # x-edges of the cell: ex[i, j+da, k+db]
            m = ex[:, da:da + nc, db:db + nc]
            cnt += m
            fx += m * tx[:, da:da + nc, db:db + nc]
            fy += m * da
            fz += m * db
            # y-edges: ey[i+da, j, k+db]
            m = ey[da:da + nc, :, db:db + nc]
            cnt += m
            fx += m * da
            fy += m * ty[da:da + nc, :, db:db + nc]
            fz += m * db
            # z-edges: ez[i+da, j+db, k]
            m = ez[da:da + nc, db:db + nc, :]
            cnt += m
            fx += m * da
            fy += m * db
            fz += m * tz[da:da + nc, db:db + nc, :]
    denom = jnp.maximum(cnt, 1.0)
    idx = jnp.arange(nc, dtype=jnp.float32)
    verts = jnp.stack(
        [fx / denom + idx[:, None, None],
         fy / denom + idx[None, :, None],
         fz / denom + idx[None, None, :]], axis=-1)
    if pack:
        verts = jnp.round(verts * _VQ).astype(jnp.uint16)
    return s, verts


def extract_mesh(s, verts):
    """Host compaction: (sign grid, dense per-cell verts) -> (V,3) f32 verts
    in grid-index coordinates, (F,3) int64 faces.

    Vectorized numpy only — no per-element Python.  Faces connect the four
    cells around each sign-changing interior grid edge; boundary edges (which
    lack four neighbor cells) are skipped, so solids are watertight away from
    the grid boundary (same guarantee as the marching-tets path).
    """
    s = np.asarray(s)
    verts = np.asarray(verts)
    nc = s.shape[0] - 1
    ex = s[:-1] ^ s[1:]
    ey = s[:, :-1] ^ s[:, 1:]
    ez = s[:, :, :-1] ^ s[:, :, 1:]
    active = np.zeros((nc,) * 3, bool)
    for da in (0, 1):
        for db in (0, 1):
            active |= ex[:, da:da + nc, db:db + nc]
            active |= ey[da:da + nc, :, db:db + nc]
            active |= ez[da:da + nc, db:db + nc, :]
    flat_act = active.reshape(-1)
    cell_id = np.cumsum(flat_act, dtype=np.int64) - 1
    out_verts = verts.reshape(-1, 3)[flat_act].astype(np.float32)
    if verts.dtype == np.uint16:
        out_verts /= _VQ

    def cid(i, j, k):
        return cell_id[(i * nc + j) * nc + k]

    quads = []
    # axis 0 (x) edge at (i, j, k), 1<=j,k<=nc-1: cells (i, j-1..j, k-1..k);
    # quad listed CCW seen from +axis; (u, v) = the next two axes cyclically.
    i, j, k = np.nonzero(ex[:, 1:-1, 1:-1])
    j, k = j + 1, k + 1
    q = np.stack([cid(i, j - 1, k - 1), cid(i, j, k - 1),
                  cid(i, j, k), cid(i, j - 1, k)], axis=1)
    quads.append((q, s[i, j, k]))
    # axis 1 (y): (u, v) = (z, x); cells (i-1..i, j, k-1..k)
    i, j, k = np.nonzero(ey[1:-1, :, 1:-1])
    i, k = i + 1, k + 1
    q = np.stack([cid(i - 1, j, k - 1), cid(i - 1, j, k),
                  cid(i, j, k), cid(i, j, k - 1)], axis=1)
    quads.append((q, s[i, j, k]))
    # axis 2 (z): (u, v) = (x, y); cells (i-1..i, j-1..j, k)
    i, j, k = np.nonzero(ez[1:-1, 1:-1, :])
    i, j = i + 1, j + 1
    q = np.stack([cid(i - 1, j - 1, k), cid(i, j - 1, k),
                  cid(i, j, k), cid(i - 1, j, k)], axis=1)
    quads.append((q, s[i, j, k]))

    faces = []
    for q, base_inside in quads:
        if len(q) == 0:
            continue
        # base (lower grid point) inside -> outward normal points +axis ->
        # keep CCW order; otherwise reverse the quad.
        q = np.where(base_inside[:, None], q, q[:, ::-1])
        faces.append(q[:, [0, 1, 2]])
        faces.append(q[:, [0, 2, 3]])
    if not faces:
        return out_verts, np.zeros((0, 3), np.int64)
    return out_verts, np.concatenate(faces, axis=0).astype(np.int64)


def surface_nets(grid, iso: float = 0.5, pack: bool = True):
    """Host convenience wrapper: 3D numpy field -> (verts, faces) in
    grid-index coordinates (drop-in for utils.native.marching_tets)."""
    s, verts = surface_nets_field(jnp.asarray(grid), float(iso), pack=pack)
    return extract_mesh(*jax.device_get((s, verts)))
