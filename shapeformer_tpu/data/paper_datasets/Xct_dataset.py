"""Inference-only dataset of raw partial clouds listed in a text file.

Semantics parity with shapeformer/data/paper_datasets/Xct_dataset.py:10-25;
the open3d point-cloud reader is replaced by npy / ascii-PLY loading.
"""
from __future__ import annotations

import numpy as np

from ...utils.geoutil import read_ply
from ..loader import Dataset


class XctDataset(Dataset):
    def __init__(self, Xct_list, split="test", **kwargs):
        self.paths = np.atleast_1d(np.loadtxt(Xct_list, dtype=str))

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, ind):
        path = str(self.paths[ind])
        if path.endswith(".npy"):
            Xct = np.load(path)
        elif path.endswith(".ply"):
            Xct, _ = read_ply(path)
        else:
            Xct = np.loadtxt(path)
        return {"Xct": np.asarray(Xct, np.float32)}
