"""Config system: YAML with recursive `inherit_from`, deep-merge, experiment dirs,
and a dotted-class-path reflection registry.

Semantics parity with the reference (SURVEY.md section 2.1 rows 2-3):
  get_opt / load_option / generate_meta_info / expr_mkdirs / dump
      xgutils/optutil.py:14-70
  dictUpdate (recursive deep merge)            xgutils/sysutil.py:46-64
  load_object / instantiate_from_opt           xgutils/sysutil.py:136-156

Reference YAML configs name components by dotted paths rooted at `shapeformer.`
and `xgutils.`; ALIASES remaps those prefixes onto this package so the original
config files load verbatim.
"""
from __future__ import annotations

import collections.abc
import importlib
import os
from datetime import datetime

import yaml

DEFAULT_ROOT = os.getcwd()

# Reference dotted-path prefixes -> shapeformer_tpu equivalents.
ALIASES = {
    "shapeformer.": "shapeformer_tpu.",
    "xgutils.": "shapeformer_tpu.utils.",
}

# Exact-path remaps for classes the reference defines inside model modules
# (callbacks live in shapeformer_tpu.callbacks to keep models framework-pure).
EXACT_ALIASES = {
    "shapeformer.models.vqdif.vqdif.VisSparseRecon3D":
        "shapeformer_tpu.callbacks.vqdif_vis.VisSparseRecon3D",
    "shapeformer.models.vqdif.vqdif.VisRecon3D":
        "shapeformer_tpu.callbacks.vqdif_vis.VisRecon3D",
    "shapeformer.models.shapeformer.shapeformer.VisShapeFormer":
        "shapeformer_tpu.callbacks.shapeformer_vis.VisShapeFormer",
}


def dictUpdate(d1: dict, d2: dict, recursive: bool = True) -> dict:
    """Recursively update d1 with d2 (d2 wins); mirrors sysutil.dictUpdate."""
    for k, v2 in d2.items():
        v1 = d1.get(k, None)
        if (type(v1) is type(v2) and recursive
                and isinstance(v2, collections.abc.Mapping)):
            d1[k] = dictUpdate(v1, v2)
        else:
            d1[k] = v2
    return d1


def load_option(path: str) -> dict:
    """Load a YAML option file, resolving a recursive `inherit_from` chain
    relative to the file's directory (optutil.load_option, optutil.py:44-70)."""
    with open(path, "r") as f:
        this_opt = yaml.safe_load(f) or {}
    inherit_from = this_opt.pop("inherit_from", None)
    if inherit_from is not None:
        full = os.path.abspath(os.path.join(os.path.dirname(path), inherit_from))
        base = load_option(full if os.path.exists(full) else inherit_from)
    else:
        base = {}
    return dictUpdate(base, this_opt)


def generate_meta_info(root_dir: str, name: str, src_name: str = "src") -> dict:
    """Experiment directory layout (optutil.generate_meta_info, optutil.py:14-27)."""
    root_dir = os.path.abspath(root_dir)
    experiments_dir = os.path.join(root_dir, "experiments/")
    expr_dir = os.path.join(experiments_dir, name)
    return dict(
        src_dir=os.path.join(root_dir, src_name),
        datasets_dir=os.path.join(root_dir, "datasets/"),
        experiments_dir=experiments_dir,
        expr_dir=expr_dir,
        logs_dir=os.path.join(expr_dir, "logs"),
        checkpoints_dir=os.path.join(expr_dir, "checkpoints"),
        results_dir=os.path.join(expr_dir, "results"),
        session_name=name + "_" + datetime.now().strftime("%y%m%d_%H%M"),
    )


def get_opt(spec, root_dir: str = None, src_name: str = "shapeformer_tpu") -> dict:
    """YAML path or dict -> full option dict with meta_info attached."""
    opt = load_option(spec) if isinstance(spec, str) else dict(spec)
    name = opt.get("expr_name")
    if name is None:
        raise ValueError("config must specify expr_name")
    opt["meta_info"] = generate_meta_info(
        root_dir=root_dir or DEFAULT_ROOT, name=name, src_name=src_name)
    return opt


def expr_mkdirs(opt: dict) -> None:
    m = opt["meta_info"]
    for key in ("expr_dir", "logs_dir", "checkpoints_dir", "results_dir"):
        os.makedirs(m[key], exist_ok=True)


def dump(opt: dict, target: str) -> None:
    with open(target, "w") as f:
        yaml.safe_dump(opt, f, default_flow_style=False, sort_keys=False)


# ----------------------------------------------------------------- registry
def resolve_alias(object_path: str) -> str:
    if object_path in EXACT_ALIASES:
        return EXACT_ALIASES[object_path]
    for prefix, repl in ALIASES.items():
        if object_path.startswith(prefix):
            return repl + object_path[len(prefix):]
    return object_path


def load_object(object_path: str):
    """'pkg.mod.Class' -> class object, applying reference-path aliases."""
    object_path = resolve_alias(object_path)
    module_path, _, object_name = object_path.rpartition(".")
    module = importlib.import_module(module_path)
    try:
        return getattr(module, object_name)
    except AttributeError:
        raise NameError(f"Object {object_name} not found in {module_path}")


def instantiate_from_opt(opt):
    """Instantiate {'class': dotted.path, 'kwargs': {...}} (sysutil.py:153-156)."""
    if opt is None or "class" not in opt or opt["class"] is None:
        return None
    return load_object(opt["class"])(**(opt.get("kwargs") or {}))
