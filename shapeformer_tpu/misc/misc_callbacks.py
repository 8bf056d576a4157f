"""Miscellaneous diagnostic callbacks (shapeformer/misc/misc_callbacks.py:13)."""
from __future__ import annotations

import numpy as np

from ..callbacks.base import VisCallback
from ..utils import visutil


class VisTest(VisCallback):
    """Render the raw batch contents — a data-pipeline eyeball check."""

    def __init__(self, resolution=(256, 256), **kwargs):
        super().__init__(**kwargs)
        self.resolution = tuple(resolution)

    def compute_batch(self, batch, input_name=""):
        return {"batch": batch}

    def visualize_batch(self, computed, input_name=""):
        batch = computed["batch"]
        imgs = {}
        for key in ("Xbd", "Xct", "Xtg"):
            if key in batch:
                imgs[key] = visutil.render_cloud(np.asarray(batch[key][0]),
                                                 resolution=self.resolution)
        return imgs
