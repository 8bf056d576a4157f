"""Voxel-index plots (reference xgutils/vis/vis3d.py:77-104 IndexVoxelPlot,
CubePlot) on the first-party rasterizer."""
from __future__ import annotations

import matplotlib.cm as cm
import numpy as np

from .. import nputil
from . import fresnelvis


def IndexVoxelPlot(pos_ind, val_ind, val_max=1024, depth=4,
                   manual_color=None, distinctive_color=True,
                   camera_kwargs=None, **kwargs):
    """Render the sparse VQ token grid as colored voxel cubes."""
    camera_kwargs = dict(dict(camPos=np.array([2, 2, 2.0]),
                              resolution=(512, 512)), **(camera_kwargs or {}))
    resolution = camera_kwargs["resolution"]
    pos_ind = np.asarray(pos_ind).reshape(-1)
    if len(pos_ind) == 0:
        return np.full((resolution[1], resolution[0], 3), 255, np.uint8)
    grid_dim = 2 ** depth
    box_len = 2.0 / grid_dim / 2.0
    voxel_inds = nputil.unravel_index(pos_ind, (grid_dim,) * 3)
    voxel_coords = nputil.index2point(voxel_inds, grid_dim=grid_dim)
    val_ind = np.asarray(val_ind).reshape(-1)
    if not distinctive_color:
        color = cm.Blues(val_ind / max(val_max, 1))[..., :3]
    else:
        unique, inverse = np.unique(val_ind, return_inverse=True)
        color = cm.Blues(inverse / max(unique.shape[0], 1))[..., :3]
    if manual_color is not None:
        color = manual_color
    renderer = fresnelvis.FresnelRenderer(camera_kwargs=camera_kwargs)
    renderer.add_box(center=voxel_coords, spec=np.zeros(3) + box_len,
                     color=color, **kwargs)
    return renderer.render()


def CubePlot(coords, size, color=None, cmap="Blues", camera_kwargs=None,
             renderer=None, **kwargs):
    """Generic cube scatter (vis3d.CubePlot)."""
    camera_kwargs = dict(dict(camPos=np.array([2, 2, 2.0]),
                              resolution=(512, 512)), **(camera_kwargs or {}))
    own = renderer is None
    if own:
        renderer = fresnelvis.FresnelRenderer(camera_kwargs=camera_kwargs)
    coords = np.asarray(coords, np.float32).reshape(-1, 3)
    if color is None:
        color = cm.get_cmap(cmap)(np.linspace(0.3, 0.9, len(coords)))[..., :3]
    renderer.add_box(center=coords, spec=np.asarray(size, np.float32),
                     color=color, **kwargs)
    return renderer.render() if own else renderer
