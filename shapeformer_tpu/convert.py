"""Reference (PyTorch/Lightning) checkpoint -> shapeformer_tpu converter.

A user of the reference repo brings trained `.ckpt` files (Lightning
ModelCheckpoint: {'state_dict', 'hyper_parameters', ...}); this module maps
them onto the flax variable trees so inference/fine-tuning continues here
without retraining (SURVEY.md section 7 'ckpt conversion'; numerics pinned by
tests/test_golden_torch.py and tests/test_convert.py).

Layout rules:
  - torch Linear weight (out, in)      -> flax kernel (in, out): transpose;
  - torch Conv3d weight (O, I, k0, k1, k2) -> flax kernel (k2, k1, k0, I, O):
    one transpose handles both the channels-last layout and this framework's
    reversed spatial-axis convention (the reference samples grids with
    x indexing the LAST torch spatial dim — see
    test_golden_torch.test_local_decoder_matches_reference_torch);
  - GroupNorm/LayerNorm weight -> scale;
  - the quantizer's codebook/EMA buffers land in the 'vq' collection.

CLI:
  python -m shapeformer_tpu.convert --ckpt ref.ckpt --out experiments/x/checkpoints \
      --model vqdif|shapeformer
"""
from __future__ import annotations

import argparse
import os
import re

import numpy as np


def _np(t):
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _lin(sd, key):
    out = {"kernel": _np(sd[f"{key}.weight"]).T}
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def _conv(sd, key):
    out = {"kernel": np.transpose(_np(sd[f"{key}.weight"]), (4, 3, 2, 1, 0))}
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def _norm(sd, key):
    return {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}


def _resnet_fc(sd, key):
    out = {"fc_0": _lin(sd, f"{key}.fc_0"), "fc_1": _lin(sd, f"{key}.fc_1")}
    if f"{key}.shortcut.weight" in sd:
        out["shortcut"] = _lin(sd, f"{key}.shortcut")
    return out


def _conv_layer(sd, key):
    """Reference ConvLayer 'crg' (updown.py:79) -> ConvCRG {conv, norm}."""
    return {"conv": _conv(sd, f"{key}.conv"),
            "norm": _norm(sd, f"{key}.groupnorm")}


def _single_conv(sd, key, order="gcr"):
    """wolny SingleConv -> SingleConv with positional names (unet3d.py)."""
    out = {}
    for i, ch in enumerate(order):
        if ch == "c":
            out[f"conv{i}"] = _conv(sd, f"{key}.conv")
        elif ch in ("g", "b"):
            out[f"norm{i}"] = _norm(sd, f"{key}.groupnorm")
    return out


def _strip(sd, prefix):
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def _indices(sd, pattern):
    found = set()
    rx = re.compile(pattern)
    for k in sd:
        m = rx.match(k)
        if m:
            found.add(int(m.group(1)))
    return sorted(found)


# ------------------------------------------------------------------- VQDIF
def convert_vqdif_state_dict(sd):
    """Reference VQDIF state_dict -> {'params': ..., 'vq': ...}."""
    sd = {k: v for k, v in sd.items()}
    params = {}

    enc = _strip(sd, "encoder.")
    if enc:
        e = {"fc_pos": _lin(enc, "fc_pos"), "fc_c": _lin(enc, "fc_c")}
        for i in _indices(enc, r"blocks\.(\d+)\.fc_0\.weight"):
            e[f"block{i}"] = _resnet_fc(enc, f"blocks.{i}")
        down = _strip(enc, "downsampler.")
        if down:
            d = {}
            steps = _indices(down, r"blocks\.(\d+)\.conv\.weight")
            for s in range(0, len(steps), 2):
                i = s // 2
                d[f"down{i}_conv"] = _conv_layer(down, f"blocks.{steps[s]}")
                d[f"down{i}_mix"] = _conv_layer(down, f"blocks.{steps[s + 1]}")
            e["downsampler"] = d
        params["encoder"] = e

    dec = _strip(sd, "decoder.")
    if dec:
        d = {"fc_p": _lin(dec, "fc_p"), "fc_out": _lin(dec, "fc_out")}
        for i in _indices(dec, r"fc_c\.(\d+)\.weight"):
            d[f"fc_c_{i}"] = _lin(dec, f"fc_c.{i}")
        for i in _indices(dec, r"blocks\.(\d+)\.fc_0\.weight"):
            d[f"blocks_{i}"] = _resnet_fc(dec, f"blocks.{i}")
        unet = _strip(dec, "unet3d.")
        if unet:
            u = {"final_conv": _conv(unet, "final_conv")}
            for i in _indices(unet, r"encoders\.(\d+)\."):
                u[f"encoder{i}"] = {
                    "SingleConv1": _single_conv(
                        unet, f"encoders.{i}.basic_module.SingleConv1"),
                    "SingleConv2": _single_conv(
                        unet, f"encoders.{i}.basic_module.SingleConv2")}
            for i in _indices(unet, r"decoders\.(\d+)\."):
                u[f"decoder{i}"] = {
                    "SingleConv1": _single_conv(
                        unet, f"decoders.{i}.basic_module.SingleConv1"),
                    "SingleConv2": _single_conv(
                        unet, f"decoders.{i}.basic_module.SingleConv2")}
            d["unet"] = u
        ups = _strip(dec, "upsampler.")
        if ups:
            up = {}
            blocks = _indices(ups, r"blocks\.(\d+)\.conv\.weight")
            for s in range(0, len(blocks), 2):  # blocks.3i is the Upsample
                i = s // 2
                up[f"up{i}_conv0"] = _conv_layer(ups, f"blocks.{blocks[s]}")
                up[f"up{i}_conv1"] = _conv_layer(ups, f"blocks.{blocks[s + 1]}")
            d["upsampler_mod"] = up
        params["decoder"] = d

    out = {"params": params}
    if "quantizer.embedding.weight" in sd:
        # EMA codebook state lives in the 'vq' collection under the module path
        out["vq"] = {"quantizer": {
            "codebook": _np(sd["quantizer.embedding.weight"]),
            "N": _np(sd["quantizer.N"]),
            "z_avg": _np(sd["quantizer.z_avg"])}}
    return out


# -------------------------------------------------------------- ShapeFormer
def convert_shapeformer_state_dict(sd):
    """Reference ShapeFormer state_dict (transformer.* keys; the frozen
    representer.vqvae converts separately from its own checkpoint) ->
    {'params': ...} for CondTupleGPT."""
    tf = _strip(sd, "transformer.")
    p = {"pos_emb": _np(tf["pos_emb"])}
    if "cond_pos_emb" in tf:
        p["cond_pos_emb"] = _np(tf["cond_pos_emb"])
    for i in _indices(tf, r"tok_embs\.(\d+)\.weight"):
        p[f"tok_embs_{i}"] = {"embedding": _np(tf[f"tok_embs.{i}.weight"])}
    for i in _indices(tf, r"extra_tok_embs\.(\d+)\.weight"):
        p[f"extra_tok_embs_{i}"] = {
            "embedding": _np(tf[f"extra_tok_embs.{i}.weight"])}
    for i in _indices(tf, r"blocks\.(\d+)\."):
        stage = _strip(tf, f"blocks.{i}.")
        for j in _indices(stage, r"(\d+)\.ln1\.weight"):
            blk = _strip(stage, f"{j}.")
            qkv_kernel = np.concatenate(
                [_np(blk["attn.query.weight"]).T, _np(blk["attn.key.weight"]).T,
                 _np(blk["attn.value.weight"]).T], axis=1)
            qkv_bias = np.concatenate(
                [_np(blk["attn.query.bias"]), _np(blk["attn.key.bias"]),
                 _np(blk["attn.value.bias"])])
            p[f"stages_{i}_{j}"] = {
                "ln1": _norm(blk, "ln1"), "ln2": _norm(blk, "ln2"),
                "attn": {"qkv": {"kernel": qkv_kernel, "bias": qkv_bias},
                         "proj": _lin(blk, "attn.proj")},
                "fc1": _lin(blk, "mlp.0"), "fc2": _lin(blk, "mlp.2"),
            }
    for i in _indices(tf, r"heads\.(\d+)\."):
        head = _strip(tf, f"heads.{i}.")
        layers = _indices(head, r"(\d+)\.weight")
        h = {"LayerNorm_0": _norm(head, str(layers[0]))}
        for di, j in enumerate(layers[1:]):
            h[f"Dense_{di}"] = _lin(head, str(j))
        p[f"heads_{i}"] = h
    # a flax variables dict, i.e. what ShapeFormer.init_variables returns
    return {"params": p}


# ---------------------------------------------------------------------- CLI
def convert_checkpoint(ckpt_path, out_dir, model="vqdif", epoch=0,
                       val_loss=0.0):
    """torch .ckpt/.pt -> orbax checkpoint dir (experiments layout)."""
    import torch

    from . import checkpoint as ckpt_lib

    raw = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = raw.get("state_dict", raw)
    hyper = raw.get("hyper_parameters")
    if model == "vqdif":
        variables = convert_vqdif_state_dict(sd)
    elif model == "shapeformer":
        # mirror ShapeFormerSystem state: state['params'] is a variables dict
        variables = {"params": convert_shapeformer_state_dict(sd)}
    else:
        raise ValueError(model)
    path = ckpt_lib.save_checkpoint(out_dir, variables, epoch, val_loss,
                                    hyper_parameters=hyper, top_k=10 ** 6)
    print(f"converted {ckpt_path} ({model}) -> {path}")
    return path


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--model", choices=["vqdif", "shapeformer"],
                    default="vqdif")
    args = ap.parse_args(argv)
    convert_checkpoint(args.ckpt, os.path.abspath(args.out), args.model)


if __name__ == "__main__":
    main()
