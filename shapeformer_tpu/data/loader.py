"""Minimal numpy Dataset/DataLoader (replaces torch.utils.data in the
reference's data plumbing, datamodule.py:54-64).

Host batching is plain numpy stacking; device transfer happens at the jit
boundary inside the systems layer.  Single-process by design: the build image
has one CPU core, so worker processes only add overhead; dataset __getitem__
stays cheap (HDF5 slice reads + numpy transforms).
"""
from __future__ import annotations

import numpy as np


class Dataset:
    def __len__(self):
        raise NotImplementedError

    def __getitem__(self, index):
        raise NotImplementedError


class DataLoader:
    def __init__(self, dataset, batch_size=1, shuffle=False, seed=0,
                 drop_last=False, num_workers=0, pin_memory=False):
        # drop_last defaults False like torch's DataLoader (the reference
        # keeps tail batches for train AND eval, datamodule.py:54-63); a
        # dropped tail silently excluded samples from val/test metrics and
        # a val set smaller than val_batch_size yielded ZERO batches
        # (val_loss=inf -> early-stop on a healthy model)
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._epoch = 0
        self._seed = seed

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self._seed + self._epoch)
            rng.shuffle(order)
        self._epoch += 1
        for start in range(0, n, self.batch_size):
            idx = order[start:start + self.batch_size]
            if len(idx) < self.batch_size and self.drop_last:
                break
            items = [self.dataset[int(i)] for i in idx]
            yield collate(items)


def collate(items):
    """Stack a list of dict-of-arrays into a dict of batched arrays; non-array
    values are collected into lists."""
    batch = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        if isinstance(vals[0], np.ndarray):
            batch[key] = np.stack(vals)
        elif isinstance(vals[0], (int, float, np.integer, np.floating)):
            batch[key] = np.asarray(vals)
        else:
            batch[key] = vals
    return batch
