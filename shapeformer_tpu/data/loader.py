"""Minimal numpy Dataset/DataLoader (replaces torch.utils.data in the
reference's data plumbing, datamodule.py:54-64).

Host batching is plain numpy stacking; device transfer happens at the jit
boundary inside the systems layer.  Single-process by design: the build image
has one CPU core, so worker processes only add overhead; dataset __getitem__
stays cheap (HDF5 slice reads + numpy transforms).

Prefetch seam: `prefetch=k` overlaps host batch assembly with device compute
by assembling up to k batches ahead on a background thread (the analogue of
torch DataLoader's worker prefetch, which the reference relies on for its HPR
ConvexHull-per-item selectors).  Order and epoch determinism are identical to
prefetch=0 — the thread only pipelines the same sequential iteration.  Off by
default: on a one-core host it cannot help; on a real multi-core TPU host set
prefetch=2 (or num_workers>0, which maps onto it) so per-item geometry work
(data/partial.py selectors) doesn't starve the chip.
"""
from __future__ import annotations

import queue
import threading

import numpy as np


class Dataset:
    def __len__(self):
        raise NotImplementedError

    def __getitem__(self, index):
        raise NotImplementedError


class DataLoader:
    def __init__(self, dataset, batch_size=1, shuffle=False, seed=0,
                 drop_last=False, num_workers=0, pin_memory=False,
                 prefetch=0):
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
        # torch-config parity: num_workers>0 requests background batch
        # assembly; map it onto the thread-prefetch seam (depth 2)
        self.prefetch = int(prefetch) or (2 if num_workers else 0)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self):
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

    def __iter__(self):
        if self.prefetch <= 0:
            yield from self._batches()
            return
        # background-thread prefetch: same sequential order, just assembled
        # up to `prefetch` batches ahead of the consumer
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        _END = object()
        stop = threading.Event()

        def _put(item):
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for b in self._batches():
                    if not _put(b):
                        return
                _put(_END)
            except BaseException as e:      # surface errors in the consumer
                _put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _END:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            t.join(timeout=1.0)


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
