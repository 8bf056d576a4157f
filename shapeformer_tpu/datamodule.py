"""DataModule: bundles train/val/test/visual dataset opts into loaders.

Semantics parity with shapeformer/datamodule.py:13-63: split defaulting into
each dataset opt, val <- test fallback when no valset is configured,
visual <- val fallback, per-split batch sizes.
"""
from __future__ import annotations

import copy

from . import config as _config
from .data.loader import DataLoader

_NULL = {"class": None, "kwargs": {}}


class DataModule:
    def __init__(self, batch_size: int = 32, test_batch_size=None,
                 val_batch_size=None, num_workers: int = 0,
                 trainset_opt=None, valset_opt=None, testset_opt=None,
                 visualset_opt=None):
        self.trainset_opt = copy.deepcopy(trainset_opt or _NULL)
        self.valset_opt = copy.deepcopy(valset_opt or _NULL)
        self.testset_opt = copy.deepcopy(testset_opt or _NULL)
        self.visualset_opt = copy.deepcopy(visualset_opt or _NULL)
        for opt, split in [(self.trainset_opt, "train"),
                           (self.valset_opt, "val"),
                           (self.testset_opt, "test")]:
            opt.setdefault("kwargs", {})
            if opt["kwargs"] is None:
                opt["kwargs"] = {}
            opt["kwargs"].setdefault("split", split)
        self.batch_size = batch_size
        self.test_batch_size = (test_batch_size if test_batch_size is not None
                                else batch_size)
        self.val_batch_size = (val_batch_size if val_batch_size is not None
                               else self.test_batch_size)
        self.num_workers = num_workers
        self.train_set = self.val_set = self.test_set = self.visual_set = None

    def setup(self, stage=None):
        self.train_set = _config.instantiate_from_opt(self.trainset_opt)
        self.val_set = _config.instantiate_from_opt(self.valset_opt)
        self.test_set = _config.instantiate_from_opt(self.testset_opt)
        if self.valset_opt["class"] is None:
            self.val_set = self.test_set
            self.val_batch_size = self.test_batch_size
        if self.visualset_opt["class"] is None:
            self.visual_set = self.val_set
        else:
            self.visual_set = _config.instantiate_from_opt(self.visualset_opt)

    def prepare_data(self):
        pass

    def train_dataloader(self, shuffle=True):
        return DataLoader(self.train_set, batch_size=self.batch_size,
                          shuffle=shuffle)

    def val_dataloader(self):
        return DataLoader(self.val_set, batch_size=self.val_batch_size)

    def test_dataloader(self):
        return DataLoader(self.test_set, batch_size=self.test_batch_size)

    def visual_dataloader(self):
        return DataLoader(self.visual_set, batch_size=1)
