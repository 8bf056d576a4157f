"""Checkpoint / resume on orbax, with the reference's experiment-dir semantics.

Parity targets (SURVEY.md section 5 'Checkpoint / resume'):
  - checkpoints live in experiments/<name>/checkpoints/ with directory names
    `epoch{E:03d}-val_loss{V:.4f}` (ModelCheckpoint template, trainer.py:150-160);
  - top-k retention keyed on val/loss;
  - resume policies '', 'restart', 'latest'/'last', or explicit path with
    newest-by-mtime glob (parse_resume, trainer.py:258-287);
  - hyperparameters are embedded next to the weights (save_hyperparameters,
    vqdif.py:26) so a checkpoint alone reconstructs the model
    (restore_frozen_model <- representers.py:34-48).
"""
from __future__ import annotations

import glob
import os
import shutil

import jax
import numpy as np
import orbax.checkpoint as ocp
import yaml


def _checkpointer():
    return ocp.PyTreeCheckpointer()


def save_checkpoint(ckpt_dir, state, epoch: int, val_loss: float,
                    hyper_parameters=None, top_k: int = 1):
    """Save `state` (pytree) + hyperparameters; keep only the best top_k by
    val_loss (plus always the most recent as 'last')."""
    os.makedirs(ckpt_dir, exist_ok=True)
    name = f"epoch{epoch:03d}-val_loss{val_loss:.4f}"
    path = os.path.join(os.path.abspath(ckpt_dir), name)
    if os.path.exists(path):
        shutil.rmtree(path)
    _checkpointer().save(path, jax.device_get(state))
    if hyper_parameters is not None:
        with open(os.path.join(path, "hyper_parameters.yaml"), "w") as f:
            yaml.safe_dump(hyper_parameters, f)
    _prune(ckpt_dir, top_k)
    return path


def _entries(ckpt_dir):
    out = []
    for p in glob.glob(os.path.join(ckpt_dir, "epoch*-val_loss*")):
        try:
            val = float(os.path.basename(p).split("val_loss")[1])
        except ValueError:
            continue
        out.append((p, val))
    return out


def _prune(ckpt_dir, top_k):
    entries = _entries(ckpt_dir)
    if len(entries) <= top_k:
        return
    newest = max(entries, key=lambda e: os.path.getmtime(e[0]))[0]
    keep = {p for p, _ in sorted(entries, key=lambda e: e[1])[:top_k]}
    keep.add(newest)
    for p, _ in entries:
        if p not in keep:
            shutil.rmtree(p)


def parse_resume(ckpt, checkpoints_dir):
    """'' / 'restart' -> None; 'latest'/'last' -> newest checkpoint by mtime;
    otherwise a path (relative paths resolve inside checkpoints_dir)."""
    if ckpt in ("", "restart", None):
        return None
    if ckpt in ("latest", "last"):
        ckpts = glob.glob(os.path.join(checkpoints_dir, "*"))
        ckpts = [c for c in ckpts if os.path.isdir(c)]
        if not ckpts:
            return None
        return max(ckpts, key=os.path.getmtime)
    if not os.path.isabs(ckpt):
        return os.path.join(checkpoints_dir, ckpt)
    return ckpt


def restore_checkpoint(path, target=None, allow_missing=()):
    """Restore a pytree; with `target`, leaves are matched BY PATH (key
    sequence) against the target's structure — equal leaf counts with
    different nesting fail loudly instead of silently mis-pairing.

    allow_missing: top-level target keys that MAY be absent from the
    checkpoint; their leaves keep the target's (fresh) values.  Inference
    restores pass ("opt_state", "step") so converted reference checkpoints
    (weights only, convert.py) load through --mode test/run; any missing
    WEIGHT leaf still fails loudly."""
    restored = _checkpointer().restore(os.path.abspath(path))
    if target is None:
        return restored

    def key_str(path_parts):
        out = []
        for part in path_parts:
            if hasattr(part, "key"):
                out.append(str(part.key))
            elif hasattr(part, "name"):
                out.append(str(part.name))
            elif hasattr(part, "idx"):
                out.append(str(part.idx))
            else:
                out.append(str(part))
        return "/".join(out)

    flat_r = {key_str(p): leaf for p, leaf in
              jax.tree_util.tree_flatten_with_path(restored)[0]}
    flat_t, treedef = jax.tree_util.tree_flatten_with_path(target)

    def skippable(path_parts):
        head = key_str(path_parts).split("/", 1)[0]
        return head in allow_missing

    missing = [key_str(p) for p, _ in flat_t
               if key_str(p) not in flat_r and not skippable(p)]
    assert not missing, \
        f"checkpoint at {path} lacks target leaves: {missing[:5]}" \
        f"{'...' if len(missing) > 5 else ''}"
    leaves = []
    for p, t in flat_t:
        r = flat_r.get(key_str(p))
        if r is None:
            leaves.append(t)              # allowed-missing: keep fresh value
            continue
        leaves.append(np.asarray(r).astype(t.dtype)
                      if hasattr(t, "dtype") else r)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def load_hyper_parameters(path):
    hp = os.path.join(path, "hyper_parameters.yaml")
    if not os.path.exists(hp):
        return None
    with open(hp) as f:
        return yaml.safe_load(f)


def restore_frozen_model(vqvae_opt: dict):
    """Rebuild a frozen VQDIF (module, variables) from
    {'class','ckpt_path','yaml_path'} (init_trained_model_from_ckpt,
    representers.py:34-48).  Model kwargs come from the checkpoint's embedded
    hyper_parameters, falling back to the yaml config's pl_model_opt."""
    from . import config as _config
    ckpt_path = vqvae_opt["ckpt_path"]
    if os.path.basename(ckpt_path.rstrip("/")) in ("latest", "last") \
            and not os.path.exists(ckpt_path):
        ckpt_path = parse_resume("latest",
                                 os.path.dirname(ckpt_path.rstrip("/")))
        assert ckpt_path is not None, \
            f"no checkpoints found for {vqvae_opt['ckpt_path']}"
    kwargs = load_hyper_parameters(ckpt_path)
    if kwargs is None:
        with open(vqvae_opt["yaml_path"]) as f:
            ycfg = yaml.safe_load(f)
        kwargs = ycfg["pl_model_opt"]["kwargs"]
    cls = _config.load_object(vqvae_opt["class"])
    model = cls(**kwargs)
    state = restore_checkpoint(ckpt_path)
    # a checkpoint holds the full train state; the frozen model needs only
    # its variable collections (params + vq statistics)
    variables = {k: v for k, v in state.items()
                 if k in ("params", "vq", "batch_stats")}
    variables = jax.tree_util.tree_map(np.asarray, variables)
    return model, variables
