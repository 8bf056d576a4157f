"""Diagnostic 3D rendering helpers.

Mesh and cloud renders run through the first-party C++ software rasterizer
(native/rasterizer.cpp via utils.vis.fresnelvis — the replacement for the
reference's fresnel path tracer, SURVEY.md section 2.3); matplotlib's Agg
backend covers plots, image IO and the voxel-index scatter.  The (elev, azim)
camera convention of earlier rounds is preserved and converted to the
orthographic camPos model.
"""
from __future__ import annotations

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

DEFAULT_CAMERA = dict(elev=25, azim=45)


def _setup_axis(ax, lim=1.0):
    ax.set_xlim(-lim, lim)
    ax.set_ylim(-lim, lim)
    ax.set_zlim(-lim, lim)
    ax.set_box_aspect((1, 1, 1))
    ax.axis("off")


def _fig_to_array(fig):
    fig.canvas.draw()
    img = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    plt.close(fig)
    return img


def _camera_opt(camera, resolution, dist=3.0, height=2.6):
    """(elev, azim) degrees -> orthographic camera dict for the rasterizer."""
    cam = dict(DEFAULT_CAMERA, **(camera or {}))
    el, az = np.radians(cam["elev"]), np.radians(cam["azim"])
    pos = dist * np.array([np.cos(el) * np.cos(az),
                           np.cos(el) * np.sin(az), np.sin(el)])
    return dict(camPos=pos, camLookat=np.zeros(3),
                camUp=np.array([0.0, 0.0, 1.0]),
                camHeight=cam.get("height", height), resolution=resolution,
                samples=cam.get("samples", 32))


def render_mesh(vert, face, resolution=(256, 256), camera=None, color="0.7"):
    """Flat-shaded mesh render -> (H, W, 3) uint8 (C++ rasterizer)."""
    from .vis import fresnelvis
    rgb = np.zeros(3) + float(color) if isinstance(color, str) else color
    renderer = fresnelvis.FresnelRenderer(
        camera_kwargs=_camera_opt(camera, resolution))
    if len(face):
        renderer.add_mesh(np.asarray(vert), np.asarray(face), color=rgb)
    return renderer.render()


def render_cloud(points, resolution=(256, 256), camera=None, s=1.0,
                 color=None):
    from .vis import fresnelvis
    renderer = fresnelvis.FresnelRenderer(
        camera_kwargs=_camera_opt(camera, resolution))
    p = np.asarray(points)
    if len(p):
        renderer.add_cloud(p, radius=0.008 * s,
                           color=None if isinstance(color, str) else color)
    return renderer.render()


def render_voxel_indices(pos_ind, val_ind, depth=4, val_max=4096,
                         resolution=(256, 256), camera=None):
    """Sparse VQ token plot: occupied cells colored by codebook index
    (replaces vis3d.IndexVoxelPlot, vis3d.py:77-104)."""
    cam = dict(DEFAULT_CAMERA, **(camera or {}))
    res = 2 ** depth
    fig = plt.figure(figsize=(resolution[0] / 100, resolution[1] / 100),
                     dpi=100)
    ax = fig.add_subplot(111, projection="3d")
    _setup_axis(ax, lim=res)
    ax.view_init(elev=cam["elev"], azim=cam["azim"])
    pos_ind = np.asarray(pos_ind)
    if len(pos_ind):
        ijk = np.stack(np.unravel_index(pos_ind, (res, res, res)), axis=-1)
        colors = plt.cm.turbo((np.asarray(val_ind) % val_max) / val_max)
        ax.scatter(ijk[:, 0], ijk[:, 1], ijk[:, 2], c=colors, marker="s",
                   s=120.0 * (16 / res) ** 2, linewidths=0)
        _setup_axis(ax, lim=res)
    return _fig_to_array(fig)


def saveImg(path, img):
    plt.imsave(path, np.asarray(img))


def imageGrid(images, cols=None):
    """Stack equally-sized images into one grid image."""
    images = [np.asarray(im) for im in images]
    if not images:
        return np.zeros((1, 1, 3), np.uint8)
    h, w = images[0].shape[:2]
    cols = cols or len(images)
    rows = (len(images) + cols - 1) // cols
    grid = np.full((rows * h, cols * w, 3), 255, np.uint8)
    for i, im in enumerate(images):
        r, c = divmod(i, cols)
        grid[r * h:(r + 1) * h, c * w:(c + 1) * w] = im[..., :3]
    return grid


def _to_uint8(img):
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0.0, 1.0) * 255).astype(np.uint8)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    return arr


def saveVideo(path, frames, fps: int = 8):
    """Write a frame sequence as an animated GIF (reference nputil
    imgs2video/gif helpers; GIF keeps the host dependency-free)."""
    from PIL import Image
    frames = [Image.fromarray(_to_uint8(f)) for f in frames]
    if not frames:
        return path
    if not path.endswith(".gif"):
        path = path + ".gif"
    frames[0].save(path, save_all=True, append_images=frames[1:],
                   duration=int(1000 / max(fps, 1)), loop=0)
    return path


def rotating_views(render_fn, n_frames: int = 16, **kwargs):
    """Render n_frames views with the camera azimuth swept 360 degrees;
    render_fn(camera=dict(azim=..., elev=...), **kwargs) -> image."""
    return [render_fn(camera=dict(azim=360.0 * i / n_frames, elev=20.0),
                      **kwargs) for i in range(n_frames)]
