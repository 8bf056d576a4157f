"""Alias module: the reference exposes matplotlib helpers as xgutils.vis.visutil;
the canonical implementations live in shapeformer_tpu.utils.visutil."""
from ..visutil import (imageGrid, render_cloud, render_mesh,  # noqa: F401
                       render_voxel_indices, rotating_views, saveImg,
                       saveVideo)


def showImg(img, **kwargs):
    """Notebook helper parity (xgutils visutil.showImg): headless no-op save."""
    return img
