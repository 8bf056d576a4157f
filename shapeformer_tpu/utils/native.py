"""Build + ctypes bindings for the first-party C++ host kernels in native/.

The reference leans on third-party native deps (PyMCubes, libigl, fresnel —
SURVEY.md section 2.3); this framework ships its own minimal C++ host layer,
compiled on first use with g++ and cached next to the sources.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "native"))
_BUILD_DIR = os.path.join(_NATIVE_DIR, "build")
_lock = threading.Lock()
_libs: dict = {}


def _build(name: str, sources) -> str:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    out = os.path.join(_BUILD_DIR, f"lib{name}.so")
    srcs = [os.path.join(_NATIVE_DIR, s) for s in sources]
    newest_src = max(os.path.getmtime(s) for s in srcs)
    if not os.path.exists(out) or os.path.getmtime(out) < newest_src:
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               "-std=c++17", "-o", out, *srcs]
        subprocess.run(cmd, check=True, capture_output=True)
    return out


def load(name: str, sources) -> ctypes.CDLL:
    with _lock:
        if name not in _libs:
            _libs[name] = ctypes.CDLL(_build(name, sources))
        return _libs[name]


# ------------------------------------------------------------ marching tets
def _mt_lib():
    lib = load("marching_tets", ["marching_tets.cpp"])
    if not getattr(lib, "_configured", False):
        lib.marching_tets.restype = ctypes.c_int
        lib.marching_tets.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_float,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
        lib.mt_free.argtypes = [ctypes.c_void_p]
        lib._configured = True
    return lib


def marching_tets(grid: np.ndarray, iso: float = 0.5):
    """Isosurface of a 3D scalar grid -> (verts (V,3) float32 in grid-index
    coordinates, faces (F,3) int64).  Cells with value > iso are 'inside'."""
    lib = _mt_lib()
    grid = np.ascontiguousarray(grid, dtype=np.float32)
    assert grid.ndim == 3
    vp = ctypes.POINTER(ctypes.c_float)()
    fp = ctypes.POINTER(ctypes.c_int64)()
    nv, nf = ctypes.c_int64(0), ctypes.c_int64(0)
    rc = lib.marching_tets(
        grid.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        grid.shape[0], grid.shape[1], grid.shape[2], ctypes.c_float(iso),
        ctypes.byref(vp), ctypes.byref(fp), ctypes.byref(nv), ctypes.byref(nf))
    if rc != 0:
        raise MemoryError("marching_tets allocation failed")
    try:
        verts = np.ctypeslib.as_array(vp, shape=(nv.value, 3)).copy() \
            if nv.value else np.zeros((0, 3), np.float32)
        faces = np.ctypeslib.as_array(fp, shape=(nf.value, 3)).copy() \
            if nf.value else np.zeros((0, 3), np.int64)
    finally:
        lib.mt_free(vp)
        lib.mt_free(fp)
    return verts, faces


# ------------------------------------------------------------- QEM decimation
def _dq_lib():
    lib = load("decimate", ["decimate.cpp"])
    if not getattr(lib, "_configured", False):
        lib.decimate_qem.restype = ctypes.c_int
        lib.decimate_qem.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
        lib.dq_free.argtypes = [ctypes.c_void_p]
        lib._configured = True
    return lib


def decimate_qem(verts: np.ndarray, faces: np.ndarray, target_faces: int):
    """Quadric edge-collapse simplification (native/decimate.cpp) down to
    ~target_faces triangles; returns (verts (V,3) f32, faces (F,3) i64)."""
    lib = _dq_lib()
    verts = np.ascontiguousarray(verts, dtype=np.float32)
    faces = np.ascontiguousarray(faces, dtype=np.int64)
    vp = ctypes.POINTER(ctypes.c_float)()
    fp = ctypes.POINTER(ctypes.c_int64)()
    nv, nf = ctypes.c_int64(0), ctypes.c_int64(0)
    rc = lib.decimate_qem(
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(verts),
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(faces),
        int(target_faces),
        ctypes.byref(vp), ctypes.byref(fp), ctypes.byref(nv), ctypes.byref(nf))
    if rc == -2:
        raise ValueError("decimate_qem: face index out of range "
                         "(corrupt input mesh)")
    if rc != 0:
        raise MemoryError("decimate_qem allocation failed")
    try:
        out_v = np.ctypeslib.as_array(vp, shape=(nv.value, 3)).copy() \
            if nv.value else np.zeros((0, 3), np.float32)
        out_f = np.ctypeslib.as_array(fp, shape=(nf.value, 3)).copy() \
            if nf.value else np.zeros((0, 3), np.int64)
    finally:
        lib.dq_free(vp)
        lib.dq_free(fp)
    return out_v, out_f


# ------------------------------------------------------------- surface nets
def _sn_lib():
    lib = load("surface_nets", ["surface_nets.cpp"])
    if not getattr(lib, "_configured", False):
        lib.surface_nets.restype = ctypes.c_int
        lib.surface_nets.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_float,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
        lib.sn_free.argtypes = [ctypes.c_void_p]
        lib._configured = True
    return lib


def surface_nets(grid: np.ndarray, iso: float = 0.5):
    """Naive-surface-nets isosurface (native/surface_nets.cpp): one vertex
    per sign-mixed cell, ~half the triangles of marching_tets.  Returns
    (verts (V,3) float32 in grid-index coords, faces (F,3) int64)."""
    lib = _sn_lib()
    grid = np.ascontiguousarray(grid, dtype=np.float32)
    assert grid.ndim == 3
    vp = ctypes.POINTER(ctypes.c_float)()
    fp = ctypes.POINTER(ctypes.c_int64)()
    nv, nf = ctypes.c_int64(0), ctypes.c_int64(0)
    rc = lib.surface_nets(
        grid.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        grid.shape[0], grid.shape[1], grid.shape[2], ctypes.c_float(iso),
        ctypes.byref(vp), ctypes.byref(fp), ctypes.byref(nv), ctypes.byref(nf))
    if rc != 0:
        raise MemoryError("surface_nets allocation failed")
    try:
        verts = np.ctypeslib.as_array(vp, shape=(nv.value, 3)).copy() \
            if nv.value else np.zeros((0, 3), np.float32)
        faces = np.ctypeslib.as_array(fp, shape=(nf.value, 3)).copy() \
            if nf.value else np.zeros((0, 3), np.int64)
    finally:
        lib.sn_free(vp)
        lib.sn_free(fp)
    return verts, faces
