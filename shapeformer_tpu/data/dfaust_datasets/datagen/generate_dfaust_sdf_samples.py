"""Offline D-FAUST datagen: per-frame obj -> (Xbd, Xtg, Ytg-SDF) sample files.

Semantics parity with data/dfaust_datasets/datagen/generate_dfaust_sdf_samples.py:
  - center each frame's mesh (shift by bbox center, :24-27);
  - Xbd = 64^3 surface samples; probes = half near (sigma 0.015) + half far
    (sigma 0.2) gaussian perturbations, clipped into the unit cube (:28-52);
  - Ytg = signed distance at the probes (negative inside);
  - v1 file layout <frame>_v1_{Xbd,Xtg,Ytg}.npy in float16.
igl.signed_distance is replaced by the first-party flood-fill + KD-tree
signed distance (shapeformer_tpu.utils.geoutil.signed_distance); frames are
processed with the parallelMap worker pool.
"""
from __future__ import annotations

import glob
import os
import traceback

import numpy as np

from ....utils import geoutil
from ....utils.sysutil import parallelMap

VERSION = "v1"


def apply_transform(vert):
    shift = (vert.max(axis=0) + vert.min(axis=0)) / 2
    return vert - shift[None]


def generate_gt_samples(shape_path, sample_N=64 ** 3, near_std=0.015,
                        far_std=0.2, rng=None):
    rng = rng or np.random.default_rng(0)
    vert, face = geoutil.read_obj(shape_path)
    vert = apply_transform(vert)
    if np.abs(vert).max() > 1.0:
        print("Warning, data exceeds bbox 1.", shape_path, np.abs(vert).max())
    Xbd = geoutil.sampleMesh(vert, face, sample_N, rng=rng)
    near_num = sample_N // 2
    near = Xbd[:near_num] + near_std * rng.normal(size=(near_num, 3))
    far = Xbd[near_num:] + far_std * rng.normal(size=(sample_N - near_num, 3))
    Xtg = np.concatenate([near, far], axis=0)
    out_of_box = (Xtg > 0.99) | (Xtg < -0.99)
    Xtg[out_of_box] = rng.random(out_of_box.sum()) * 2 - 1
    Xtg = Xtg.clip(-0.99, 0.99)
    Ytg, _, _ = geoutil.signed_distance(Xtg, vert, face)
    return (Xbd.astype(np.float16), Xtg.astype(np.float16),
            Ytg.astype(np.float16))


def generate_dfaust_shape_sdf_samples(shape_path):
    try:
        stem = os.path.splitext(shape_path)[0]
        Xbd, Xtg, Ytg = generate_gt_samples(shape_path)
        np.save(f"{stem}_{VERSION}_Xbd.npy", Xbd)
        np.save(f"{stem}_{VERSION}_Xtg.npy", Xtg)
        np.save(f"{stem}_{VERSION}_Ytg.npy", Ytg)
    except Exception as e:
        traceback.print_exc()
        print(f"Error during sample generation: {shape_path}", e)
        return 1
    return 0


def generate_dfaust_sdf_samples(data_root="datasets/DFAUST/data/"):
    shapes = sorted(glob.glob(os.path.join(data_root, "*", "*.obj")))
    print("num of shapes", len(shapes))
    codes = parallelMap(generate_dfaust_shape_sdf_samples, shapes)
    np.save(os.path.join(os.path.dirname(data_root.rstrip("/")),
                         "voxelization_failure_code.npy"), np.array(codes))
    print("Percentage of failure:", np.array(codes).mean())
    return codes


if __name__ == "__main__":
    generate_dfaust_sdf_samples()
