"""Occupancy-field recon plots (reference xgutils/vis/npfvis.py:88-98)."""
from __future__ import annotations

import numpy as np

from .. import geoutil
from ..sysutil import dictUpdate
from . import fresnelvis


def plot_3d_recon(Xtg, Ytg, if_decimate=False, camera_kwargs=None,
                  meshC=fresnelvis.gray_color, samples=None,
                  return_mesh=False):
    """Marching-cubes the field and render it (npfvis.plot_3d_recon:88)."""
    camera = dict(camPos=np.array([2, 2, 2.0]),
                  camLookat=np.array([0.0, 0.0, 0.0]),
                  camUp=np.array([0, 1, 0.0]), camHeight=2.414,
                  resolution=(256, 256))
    dictUpdate(camera, camera_kwargs or {})
    if samples is not None:
        camera["samples"] = samples
    vert, face = geoutil.array2mesh(np.asarray(Ytg).reshape(-1),
                                    coords=np.asarray(Xtg), thresh=0.5,
                                    if_decimate=if_decimate)
    img = fresnelvis.renderMeshCloud(mesh={"vert": vert, "face": face},
                                     meshC=meshC, **camera)
    if return_mesh:
        return img, vert, face
    return img
