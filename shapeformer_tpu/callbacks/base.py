"""VisCallback framework: dataset -> compute -> visualize with disk caching.

Semantics parity with xgutils/plutil.py:99-287 (VisCallback + FlyObj):
  - per-index pipeline: one dataset item -> device compute -> host visualize;
  - computed tensors cached to <data_dir>/computed/<ind>.npz, images written
    to <data_dir>/visual/<ind>_<key>.png (FlyObj / ImageFlyObj caching);
  - per-rank index sharding for multi-process visualization
    (get_effective_visual_indices, plutil.py:123-139);
  - failure containment: per-item try/except with failed-index logs per rank
    (plutil.py:199-209);
  - hooks: on_epoch_end (every_n_epoch), on_test_start (process_all),
    post_training_process.
"""
from __future__ import annotations

import os
import traceback

import numpy as np

from ..data.loader import collate
from ..utils import visutil


def get_effective_visual_indices(indices, global_rank, num_ranks):
    """Strided assignment of visual indices to ranks (plutil.py:123-139)."""
    indices = np.array(indices)
    total = len(indices)
    batch = -(-(total - global_rank) // num_ranks)
    eff = global_rank + num_ranks * np.arange(max(batch, 0))
    return indices[eff[eff < total]]


class VisCallback:
    def __init__(self, visual_indices=(0, 1, 2, 3, 4, 5), all_indices=False,
                 force_visual_indices=False, every_n_epoch=3,
                 no_sanity_check=False, load_compute=False, load_visual=False,
                 data_dir=None, output_name=None, num_gpus=1,
                 parallel_vis=False, single_vis=True,
                 visall_after_training_end=True, **unused):
        self.visual_indices = visual_indices
        self.every_n_epoch = every_n_epoch
        self.no_sanity_check = no_sanity_check
        self.load_compute = load_compute
        self.data_dir = data_dir or f"results/{output_name or type(self).__name__}"
        self.num_gpus = num_gpus
        self.parallel_vis = parallel_vis
        self.visall_after_training_end = visall_after_training_end
        if all_indices and not force_visual_indices:
            self.visual_indices = "all"
        self.system = None
        self.state = None
        # optional image sink (trainer sets this when logger: tensorboard;
        # replaces the reference's wandb image grids, plutil.py:274-287)
        self.image_logger = None
        self._epoch = 0

    # ----------------------------------------------------- subclass interface
    def compute_batch(self, batch, input_name=""):
        raise NotImplementedError

    def visualize_batch(self, computed, input_name=""):
        raise NotImplementedError

    # -------------------------------------------------------------- pipeline
    def process(self, system, state, dloader, visual_indices=None,
                global_rank=0):
        self.system, self.state = system, state
        dset = dloader.dataset
        indices = visual_indices if visual_indices is not None \
            else self.visual_indices
        if isinstance(indices, str) and indices == "all":
            indices = list(range(len(dset)))
        indices = [i for i in indices if i < len(dset)]
        if self.parallel_vis:
            indices = get_effective_visual_indices(
                indices, global_rank, self.num_gpus).tolist()
        compute_dir = os.path.join(self.data_dir, "computed")
        visual_dir = os.path.join(self.data_dir, "visual")
        os.makedirs(compute_dir, exist_ok=True)
        os.makedirs(visual_dir, exist_ok=True)
        failed = []
        all_imgs = []
        for ind in indices:
            name = str(ind)
            try:
                item = dset[int(ind)]
                if isinstance(item.get("name"), str):
                    name = item["name"]
                batch = collate([item])
                cpath = os.path.join(compute_dir, f"{name}.npz")
                if self.load_compute and os.path.exists(cpath):
                    computed = dict(np.load(cpath, allow_pickle=True))
                    computed = {k: (v.item() if v.dtype == object else v)
                                for k, v in computed.items()}
                    computed["batch"] = batch
                else:
                    computed = self.compute_batch(batch, input_name=name)
                    savable = {k: np.asarray(v) for k, v in computed.items()
                               if isinstance(v, (np.ndarray, float, int))
                               or hasattr(v, "shape")}
                    np.savez(cpath, **savable)
                imgs = self.visualize_batch(computed, input_name=name)
                for key, img in (imgs or {}).items():
                    visutil.saveImg(
                        os.path.join(visual_dir, f"{name}_{key}.png"), img)
                    if self.image_logger is not None:
                        self.image_logger(f"{type(self).__name__}/{name}_{key}",
                                          img, self._epoch)
                all_imgs.append((name, imgs))
            except Exception as e:
                traceback.print_exc()
                print(f"[{type(self).__name__}] index {ind} failed: {e}")
                failed.append(ind)
        log_dir = os.path.join(self.data_dir, "logs", "failed_ind")
        os.makedirs(log_dir, exist_ok=True)
        np.savetxt(os.path.join(log_dir, f"rank_{global_rank}.txt"),
                   np.array(failed))
        self.imgs = all_imgs
        return all_imgs

    def process_all(self, system, state, dloader, **kw):
        return self.process(system, state, dloader, visual_indices="all", **kw)

    # ----------------------------------------------------------------- hooks
    def on_epoch_end(self, system, state, datamodule, epoch):
        self._epoch = epoch
        if (epoch + 1) % self.every_n_epoch == 0:
            try:
                self.process(system, state, datamodule.visual_dataloader())
            except Exception as err:
                traceback.print_exc()
                print("Something is wrong in the callback, skipping...", err)

    def on_test_start(self, system, state, datamodule):
        self.process_all(system, state, datamodule.visual_dataloader())

    def post_training_process(self, system, state, datamodule):
        if self.visall_after_training_end:
            self.process_all(system, state, datamodule.visual_dataloader())
