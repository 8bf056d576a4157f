"""Orthographic scene renderer with the reference fresnelvis API surface.

Re-implements xgutils/vis/fresnelvis.py (renderMeshCloud:198-216,
FresnelRenderer:253+, render_mesh/render_cloud) on the first-party C++
software rasterizer (native/rasterizer.cpp) instead of the fresnel
C++/CUDA path tracer (SURVEY.md section 2.3): same camera model
(camPos/camLookat/camUp/camHeight orthographic), flat-shaded meshes,
sphere-splatted clouds, white background.  `samples` maps to supersampling.
"""
from __future__ import annotations

import ctypes

import numpy as np

from .. import native

gray_color = np.array([0.9, 0.9, 0.9])
blue_color = np.array([0.45, 0.61, 0.84])

dflt_camera = dict(camPos=np.array([2.0, 2.0, 2.0]),
                   camLookat=np.array([0.0, 0.0, 0.0]),
                   camUp=np.array([0.0, 1.0, 0.0]),
                   camHeight=2.414, resolution=(512, 512), samples=32)


def _lib():
    lib = native.load("rasterizer", ["rasterizer.cpp"])
    if not getattr(lib, "_configured", False):
        lib.raster_scene.restype = ctypes.c_int
        lib.raster_scene.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte)]
        lib._configured = True
    return lib


def _face_colors(color, n_faces):
    color = np.asarray(color if color is not None else gray_color, np.float32)
    if color.ndim == 1:
        return np.broadcast_to(color[None, :3], (n_faces, 3)).copy()
    return np.ascontiguousarray(color[:, :3], np.float32)


class FresnelRenderer:
    """Accumulate meshes/clouds/boxes, then render() -> (H, W, 3) uint8."""

    def __init__(self, camera_kwargs=None, lights="rembrandt", **unused):
        self.camera_opt = dict(dflt_camera, **(camera_kwargs or {}))
        self._verts, self._faces, self._fcolors = [], [], []
        self._cloud, self._ccolors, self._cradii = [], [], []
        self._n_verts = 0

    # ------------------------------------------------------------- geometry
    def add_mesh(self, vert, face=None, color=None, **unused):
        if isinstance(vert, dict):       # renderMeshCloud2-style mesh dict
            vert, face = vert["vert"], vert["face"]
        vert = np.ascontiguousarray(np.asarray(vert, np.float32).reshape(-1, 3))
        face = np.asarray(face, np.int64).reshape(-1, 3)
        self._verts.append(vert)
        self._faces.append(face + self._n_verts)
        self._fcolors.append(_face_colors(color, face.shape[0]))
        self._n_verts += vert.shape[0]
        return self

    def add_cloud(self, cloud, radius=0.006, color=None, **unused):
        cloud = np.ascontiguousarray(np.asarray(cloud, np.float32).reshape(-1, 3))
        color = np.asarray(color if color is not None else blue_color,
                           np.float32)
        if color.ndim == 1:
            color = np.broadcast_to(color[None, :3],
                                    (cloud.shape[0], 3)).copy()
        self._cloud.append(cloud)
        self._ccolors.append(np.ascontiguousarray(color[:, :3], np.float32))
        # per-cloud radius, like fresnel's per-geometry radii (a single
        # scene-wide radius collapsed axes/bbox line thickness to whichever
        # cloud was added last)
        self._cradii.append(np.full(cloud.shape[0], float(radius), np.float32))
        return self

    def add_box(self, center, spec, color=None, solid=0.0, **unused):
        """Axis-aligned boxes: center (N, 3), spec (3,) or (N, 3) half-extent
        (fresnelvis.FresnelRenderer.add_box used by vis3d.IndexVoxelPlot)."""
        center = np.asarray(center, np.float32).reshape(-1, 3)
        spec = np.broadcast_to(np.asarray(spec, np.float32), center.shape)
        color = np.asarray(color if color is not None else gray_color,
                           np.float32)
        if color.ndim == 1:
            color = np.broadcast_to(color[None, :3], (center.shape[0], 3))
        corners = np.array([[x, y, z] for x in (-1, 1) for y in (-1, 1)
                            for z in (-1, 1)], np.float32)   # (8, 3)
        quads = [(0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1),
                 (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3)]
        tris = np.array([[q[0], q[1], q[2]] for q in quads]
                        + [[q[0], q[2], q[3]] for q in quads], np.int64)
        for i in range(center.shape[0]):
            vert = center[i][None] + corners * spec[i][None]
            self.add_mesh(vert, tris, color=color[i])
        return self

    def addAxes(self, length=1.0, n=64):
        for axis, col in zip(np.eye(3), np.eye(3)):
            pts = np.linspace(0, length, n)[:, None] * axis[None]
            self.add_cloud(pts, radius=0.008, color=col)
        return self

    def addBBox(self, bbox=((-1, -1, -1), (1, 1, 1)), n=32):
        lo, hi = np.asarray(bbox, np.float32)
        corners = np.array([[x, y, z] for x in (lo[0], hi[0])
                            for y in (lo[1], hi[1]) for z in (lo[2], hi[2])])
        edges = [(0, 1), (0, 2), (0, 4), (3, 1), (3, 2), (3, 7), (5, 1),
                 (5, 4), (5, 7), (6, 2), (6, 4), (6, 7)]
        t = np.linspace(0, 1, n)[:, None]
        for a, b in edges:
            self.add_cloud(corners[a][None] * (1 - t) + corners[b][None] * t,
                           radius=0.004, color=np.zeros(3) + 0.3)
        return self

    # --------------------------------------------------------------- render
    def render(self, **unused):
        opt = self.camera_opt
        W, H = int(opt["resolution"][0]), int(opt["resolution"][1])
        ssaa = 2 if int(opt.get("samples", 32)) > 1 else 1
        cam = np.concatenate([
            np.asarray(opt["camPos"], np.float32).reshape(3),
            np.asarray(opt["camLookat"], np.float32).reshape(3),
            np.asarray(opt["camUp"], np.float32).reshape(3),
            np.asarray([opt["camHeight"]], np.float32)]).astype(np.float32)
        verts = (np.concatenate(self._verts) if self._verts
                 else np.zeros((0, 3), np.float32))
        faces = (np.concatenate(self._faces) if self._faces
                 else np.zeros((0, 3), np.int64))
        fcol = (np.concatenate(self._fcolors) if self._fcolors
                else np.zeros((0, 3), np.float32))
        cloud = (np.concatenate(self._cloud) if self._cloud
                 else np.zeros((0, 3), np.float32))
        ccol = (np.concatenate(self._ccolors) if self._ccolors
                else np.zeros((0, 3), np.float32))
        cradii = (np.concatenate(self._cradii) if self._cradii
                  else np.zeros((0,), np.float32))
        out = np.empty((H, W, 3), np.uint8)
        fp = ctypes.POINTER(ctypes.c_float)
        rc = _lib().raster_scene(
            verts.ctypes.data_as(fp), verts.shape[0],
            faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            faces.shape[0], fcol.ctypes.data_as(fp),
            cloud.ctypes.data_as(fp), cloud.shape[0],
            ccol.ctypes.data_as(fp), cradii.ctypes.data_as(fp),
            cam.ctypes.data_as(fp), W, H, ssaa,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
        assert rc == 0
        return out


def renderMeshCloud(mesh=None, meshC=gray_color, cloud=None, cloudR=0.006,
                    cloudC=None, camPos=None, camLookat=None,
                    camUp=np.array([0, 0, 1.0]), camHeight=1.0, samples=32,
                    axes=False, bbox=False, resolution=(1024, 1024),
                    lights="rembrandt", **kwargs):
    """Reference fresnelvis.renderMeshCloud:198-216 surface."""
    camera = dict(resolution=resolution, samples=samples, camPos=camPos,
                  camLookat=camLookat if camLookat is not None
                  else np.zeros(3), camUp=camUp, camHeight=camHeight)
    if camPos is None:
        camera["camPos"] = dflt_camera["camPos"]
    renderer = FresnelRenderer(camera_kwargs=camera, lights=lights)
    if axes:
        renderer.addAxes()
    if bbox:
        renderer.addBBox()
    if mesh is not None and len(mesh["vert"]):
        renderer.add_mesh(mesh["vert"], mesh["face"], color=meshC)
    if cloud is not None and len(cloud):
        renderer.add_cloud(cloud, radius=cloudR, color=cloudC)
    return renderer.render()


def render_mesh(vert, face, camera_kwargs=None, render_kwargs=None, **kwargs):
    renderer = FresnelRenderer(camera_kwargs=camera_kwargs)
    renderer.add_mesh(vert, face, **kwargs)
    return renderer.render(**(render_kwargs or {}))


def render_cloud(cloud, camera_kwargs=None, render_kwargs=None, **kwargs):
    renderer = FresnelRenderer(camera_kwargs=camera_kwargs)
    renderer.add_cloud(cloud=cloud, **kwargs)
    return renderer.render(**(render_kwargs or {}))
