"""Demo dataset: named shapes loaded from per-directory npy files.

Semantics parity with shapeformer/data/paper_datasets/list_dataset.py:13-37:
ditem_list names one shape directory per line under the list's directory,
each holding {Xbd,Xct}.npy; optional random subsampling to fixed counts.
"""
from __future__ import annotations

import os

import numpy as np

from ..loader import Dataset


class ListDataset(Dataset):
    def __init__(self, ditem_list, split="test", load_keys=("Xbd", "Xct"),
                 subsample=True, boundary_N=32768, context_N=16384,
                 evalseed=314, **kwargs):
        self.load_keys = load_keys
        self.subsample = subsample
        self.boundary_N, self.context_N = boundary_N, context_N
        self.ditem_names = np.atleast_1d(np.loadtxt(ditem_list, dtype=str))
        self.list_dir = os.path.dirname(ditem_list)
        self.rng = np.random.default_rng(evalseed)

    def __len__(self):
        return len(self.ditem_names)

    def __getitem__(self, ind):
        path = os.path.join(self.list_dir, str(self.ditem_names[ind]))
        ditem = {key: np.load(os.path.join(path, f"{key}.npy"))
                 for key in self.load_keys}
        ditem["name"] = str(self.ditem_names[ind])
        if self.subsample:
            if "Xbd" in ditem:
                ditem["Xbd"] = ditem["Xbd"][
                    self.rng.integers(0, ditem["Xbd"].shape[0], self.boundary_N)]
            if "Xct" in ditem:
                ditem["Xct"] = ditem["Xct"][
                    self.rng.integers(0, ditem["Xct"].shape[0], self.context_N)]
        return ditem
