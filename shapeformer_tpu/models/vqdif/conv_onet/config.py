"""ConvONet config factories (conv_onet/config.py:15-163 — vestigial
upstream; re-expressed over this framework's registry)."""
from __future__ import annotations

from .... import config as _config
from . import models, training
from .generation import Generator3D


def get_model(cfg, dataset=None, **kwargs):
    """cfg['model'] carries decoder/encoder {'class', 'kwargs'} opts."""
    m = cfg["model"]
    return models.ConvolutionalOccupancyNetwork(
        decoder_opt=m["decoder_opt"], encoder_opt=m.get("encoder_opt"))


def get_trainer(model, tx, cfg, **kwargs):
    t = cfg.get("training", {})
    return training.Trainer(model, tx,
                            input_type=t.get("input_type", "pointcloud"),
                            threshold=cfg.get("test", {}).get("threshold", 0.5),
                            eval_sample=t.get("eval_sample", False))


def get_generator(model, cfg, variables=None, **kwargs):
    g = cfg.get("generation", {})
    return Generator3D(
        model, variables,
        threshold=cfg.get("test", {}).get("threshold", 0.5),
        resolution0=g.get("resolution_0", 32),
        upsampling_steps=g.get("upsampling_steps", 2),
        padding=cfg.get("data", {}).get("padding", 0.1))
