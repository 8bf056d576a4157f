"""System utilities: dict merge, reflection, timers, worker-pool map.

Alias target for the reference's `xgutils.sysutil` (semantics parity with
xgutils/sysutil.py): dictUpdate (:46-64), load_object / instantiate_from_opt
(:136-156), mkdirs (:110-128), Timer (:86-94), parallelMap (:176, pathos ->
multiprocessing here), progbar.
"""
from __future__ import annotations

import os
import time

# re-export the registry/merge functions from the config module (single source)
from ..config import (dictUpdate, instantiate_from_opt,  # noqa: F401
                      load_object, resolve_alias)


def load_module_object(module_path, object_name):
    return load_object(f"{module_path}.{object_name}")


def mkdir(path):
    os.makedirs(path, exist_ok=True)


def mkdirs(paths):
    if isinstance(paths, (list, tuple)):
        for p in paths:
            mkdir(p)
    else:
        mkdir(paths)


def filename(path, suffix=False):
    name = os.path.basename(path)
    return name if suffix else ".".join(name.split(".")[:-1])


def progbar(iterable, total=None):
    """Lightweight progress iterator (stdout dots every ~5%)."""
    items = list(iterable) if total is None else iterable
    total = total or len(items)
    step = max(total // 20, 1)
    for i, x in enumerate(items):
        if i % step == 0:
            print(f"[{i}/{total}]", end=" ", flush=True)
        yield x
    print(f"[{total}/{total}]", flush=True)


class Timer:
    def __init__(self):
        self.time_stamps = [time.time()]

    def update(self, print_time=True):
        self.time_stamps.append(time.time())
        dt = self.time_stamps[-1] - self.time_stamps[-2]
        if print_time:
            print(f"{dt:.4f}s")
        return dt


def parallelMap(func, args_list, workers=None, zippedIn=True):
    """Map func over a list with a process pool (xgutils parallelMap via
    pathos); falls back to sequential on single-core hosts or worker=1."""
    if zippedIn is False and len(args_list) == 1 and isinstance(args_list[0],
                                                               (list, tuple)):
        args_list = list(args_list[0])
    workers = workers if workers is not None else (os.cpu_count() or 1)
    if workers <= 1:
        return [func(a) for a in args_list]
    import multiprocessing as mp
    with mp.get_context("spawn").Pool(workers) as pool:
        return pool.map(func, args_list)


def makeArchive(src_dir, dst_path):
    """Zip a source tree (trainer.py:196 uses this for experiment snapshots)."""
    import shutil
    base = dst_path[:-4] if dst_path.endswith(".zip") else dst_path
    return shutil.make_archive(base, "zip", src_dir)
