"""ConvONet model remnants (upstream convolutional-occupancy-networks code the
reference vendors under shapeformer/models/vqdif/conv_onet/models/ — vestigial
for the shipped configs, kept for component parity, SURVEY.md section 2.1
row 38).

  ConvolutionalOccupancyNetwork   models/__init__.py:14-87
  LocalDecoder                    models/decoder.py:8-93 (the shipped variant
                                  lives in shapeformer_tpu.models.vqdif.dec)
  PatchLocalDecoder               models/decoder.py:96-190 (plane/grid crops)
  LocalPointDecoder               models/decoder.py:191-279 (PointConv kernel)
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ....ops.grid_sample import trilinear_sample
from ...layers import ResnetBlockFC
from ..dec import LocalDecoder  # noqa: F401  (decoder.py:8 — canonical impl)


def bilinear_sample(plane, p_nor):
    """(B, H, W, C) plane + (B, M, 2) coords in [0, 1] -> (B, M, C); 2D
    analogue of trilinear_sample (align_corners=True, border padding)."""
    B, H, W, C = plane.shape
    f = p_nor * (jnp.asarray([H, W], p_nor.dtype) - 1.0)
    raw = jnp.floor(f).astype(jnp.int32)
    w = (f - raw.astype(p_nor.dtype)).astype(plane.dtype)
    hi = jnp.asarray([H - 1, W - 1], jnp.int32)
    i0 = jnp.clip(raw, 0, hi)
    i1 = jnp.clip(raw + 1, 0, hi)
    b = jnp.arange(B, dtype=jnp.int32)[:, None]
    c00 = plane[b, i0[..., 0], i0[..., 1]]
    c01 = plane[b, i0[..., 0], i1[..., 1]]
    c10 = plane[b, i1[..., 0], i0[..., 1]]
    c11 = plane[b, i1[..., 0], i1[..., 1]]
    wy, wx = w[..., 0:1], w[..., 1:2]
    return ((c00 * (1 - wx) + c01 * wx) * (1 - wy)
            + (c10 * (1 - wx) + c11 * wx) * wy)


class PatchLocalDecoder(nn.Module):
    """Crop-training decoder (decoder.py:96-190): queries carry precomputed
    normalized coords per feature plane/grid ({'p': ..., 'p_n': {...}})."""
    dim: int = 3
    c_dim: int = 128
    hidden_size: int = 256
    n_blocks: int = 5
    leaky: bool = False
    sample_mode: str = "bilinear"
    padding: float = 0.1

    @nn.compact
    def __call__(self, p, c_planes):
        p_n = p["p_n"]
        query = p["p"]
        c = 0.0
        if self.c_dim != 0:
            for key, feat in c_planes.items():
                if key == "grid":
                    c = c + trilinear_sample(feat, p_n["grid"])
                else:
                    c = c + bilinear_sample(feat, p_n[key])
        net = nn.Dense(self.hidden_size, name="fc_p")(query)
        for i in range(self.n_blocks):
            if self.c_dim != 0:
                net = net + nn.Dense(self.hidden_size, name=f"fc_c_{i}")(c)
            net = ResnetBlockFC(name=f"blocks_{i}")(net)
        act = (lambda x: nn.leaky_relu(x, 0.2)) if self.leaky else nn.relu
        return nn.Dense(1, name="fc_out")(act(net))[..., 0]


class LocalPointDecoder(nn.Module):
    """PointConv-style decoder (decoder.py:191-279): query features are a
    gaussian / inverse-distance kernel average of per-point features."""
    dim: int = 3
    c_dim: int = 128
    hidden_size: int = 256
    n_blocks: int = 5
    leaky: bool = False
    sample_mode: str = "gaussian"
    gaussian_val: float = 0.1

    def sample_point_feature(self, q, p, fea):
        dist = jnp.linalg.norm(p[:, None, :, :] - q[:, :, None, :],
                               axis=-1) + 1e-5
        if self.sample_mode == "gaussian":
            w = jnp.exp(-(dist ** 2) / (self.gaussian_val ** 2))
        else:
            w = 1.0 / dist
        w = w / w.sum(axis=2, keepdims=True)
        return jnp.einsum("bmn,bnc->bmc", w, fea)

    @nn.compact
    def __call__(self, q, c):
        net = nn.Dense(self.hidden_size, name="fc_p")(q)
        feat = None
        if self.c_dim != 0:
            p, fea = c
            feat = self.sample_point_feature(q, p, fea)
        for i in range(self.n_blocks):
            if feat is not None:
                net = net + nn.Dense(self.hidden_size, name=f"fc_c_{i}")(feat)
            net = ResnetBlockFC(name=f"blocks_{i}")(net)
        act = (lambda x: nn.leaky_relu(x, 0.2)) if self.leaky else nn.relu
        return nn.Dense(1, name="fc_out")(act(net))[..., 0]


class ConvolutionalOccupancyNetwork(nn.Module):
    """Encoder + decoder wrapper returning occupancy logits
    (models/__init__.py:14-87; the Bernoulli head stays a logits tensor —
    functional jax has no distribution object in the hot path)."""
    decoder_opt: dict
    encoder_opt: Optional[dict] = None

    def setup(self):
        from .... import config as _config
        self.decoder = _config.instantiate_from_opt(self.decoder_opt)
        self.encoder = (_config.instantiate_from_opt(self.encoder_opt)
                        if self.encoder_opt else None)

    def encode_inputs(self, inputs):
        if self.encoder is None:
            return jnp.zeros(inputs.shape[:1] + (0,))
        return self.encoder(inputs)

    def decode(self, p, c, **kw):
        return self.decoder(p, c, **kw)

    def __call__(self, p, inputs, **kw):
        return self.decode(p, self.encode_inputs(inputs), **kw)
