"""Quantitative metrics: volumetric IoU, Chamfer distance, Total Mutual
Difference (completion-diversity), plus the offline evaluator over exported
eval/*.npz point clouds.

Semantics parity:
  compute_iou / chamfer      shapeformer/models/vqdif/common.py:8-122
  external eval protocol     README.md:117-119 (the reference ships IoU /
                             Chamfer / TMD evaluation as a separate archive
                             consuming eval_pc exports; here it is built in).
"""
from __future__ import annotations

import glob
import os

import numpy as np


def compute_iou(occ1, occ2, threshold: float = 0.5):
    """Volumetric IoU over batched occupancy arrays (common.py:8-36)."""
    occ1 = np.asarray(occ1).reshape(np.asarray(occ1).shape[0], -1) \
        if np.asarray(occ1).ndim >= 2 else np.asarray(occ1)[None]
    occ2 = np.asarray(occ2).reshape(np.asarray(occ2).shape[0], -1) \
        if np.asarray(occ2).ndim >= 2 else np.asarray(occ2)[None]
    o1, o2 = occ1 >= threshold, occ2 >= threshold
    union = (o1 | o2).sum(axis=-1).astype(np.float64)
    inter = (o1 & o2).sum(axis=-1).astype(np.float64)
    return inter / np.maximum(union, 1.0)


def _nn_dist2(src, dst):
    """Squared distance of each src point to its nearest dst point (KD-tree)."""
    from scipy.spatial import cKDTree
    d, _ = cKDTree(np.asarray(dst)).query(np.asarray(src), k=1, workers=-1)
    return d.astype(np.float64) ** 2


def chamfer_distance(points1, points2):
    """Symmetric squared-distance Chamfer (common.py:39-122 semantics:
    mean-of-nearest in both directions, summed)."""
    return float(_nn_dist2(points1, points2).mean()
                 + _nn_dist2(points2, points1).mean())


def unidirectional_chamfer(src, dst):
    """Mean squared distance src -> dst (completion-fidelity direction)."""
    return float(_nn_dist2(src, dst).mean())


def total_mutual_difference(completions):
    """TMD: mean pairwise Chamfer among K completions of one shape — the
    multimodality metric of the ShapeFormer paper (arXiv 2201.10326)."""
    K = len(completions)
    if K < 2:
        return 0.0
    acc = 0.0
    for i in range(K):
        for j in range(i + 1, K):
            acc += chamfer_distance(completions[i], completions[j])
    return float(2.0 * acc / (K * (K - 1)))


def evaluate_eval_dir(eval_dir, gt_dir=None, subsample: int = 16384,
                      seed: int = 0):
    """Score exported eval/*.npz files.

    Each npz holds eval_pc (best completion) and recon_i candidates
    (VisShapeFormer export, shapeformer.py:309-327).  With gt_dir (npz files
    of the same names holding eval_pc ground truth), reports Chamfer against
    GT; always reports TMD over candidates.
    """
    rng = np.random.default_rng(seed)
    rows = []
    for path in sorted(glob.glob(os.path.join(eval_dir, "*.npz"))):
        name = os.path.splitext(os.path.basename(path))[0]
        data = np.load(path)
        recons = [data[k] for k in sorted(data.files)
                  if k.startswith("recon_")]
        if not recons:
            recons = [data["eval_pc"]]
        recons = [r[rng.integers(0, len(r), min(subsample, len(r)))]
                  for r in recons]
        row = dict(name=name, tmd=total_mutual_difference(recons))
        if gt_dir is not None:
            gt_path = os.path.join(gt_dir, f"{name}.npz")
            if os.path.exists(gt_path):
                gt = np.load(gt_path)["eval_pc"]
                gt = gt[rng.integers(0, len(gt), min(subsample, len(gt)))]
                best = data["eval_pc"]
                best = best[rng.integers(0, len(best),
                                         min(subsample, len(best)))]
                row["chamfer"] = chamfer_distance(best, gt)
                row["min_chamfer"] = min(chamfer_distance(r, gt)
                                         for r in recons)
        rows.append(row)
    summary = {}
    for key in ("tmd", "chamfer", "min_chamfer"):
        vals = [r[key] for r in rows if key in r]
        if vals:
            summary[f"mean_{key}"] = float(np.mean(vals))
    return rows, summary


def main(argv=None):
    import argparse
    import json
    p = argparse.ArgumentParser(
        description="Evaluate exported eval/*.npz completions")
    p.add_argument("eval_dir")
    p.add_argument("--gt_dir", default=None)
    args = p.parse_args(argv)
    rows, summary = evaluate_eval_dir(args.eval_dir, args.gt_dir)
    for r in rows:
        print(json.dumps(r))
    print(json.dumps({"summary": summary}))


if __name__ == "__main__":
    main()
