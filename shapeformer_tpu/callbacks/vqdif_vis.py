"""VQDIF reconstruction / generation callbacks.

Semantics parity with the callbacks in shapeformer/models/vqdif/vqdif.py:
  VisRecon3D        (vqdif.py:170-212): straight encode->decode roundtrip;
  VisSparseRecon3D  (vqdif.py:215-310): quantize_cloud -> sparse token codec
    roundtrip -> decode_index at decoder_resolution^3 -> mesh + .ply + eval
    point-cloud export + token/mask voxel plots.  This is the fidelity-parity
    harness for the rebuild (SURVEY.md section 3.5).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..models.vqdif.vqdif import VQDIF
from ..ops import sparse as sparse_ops
from ..utils import geoutil, visutil
from ..utils.nputil import makeGrid, sigmoid
from .base import VisCallback


class VisSparseRecon3D(VisCallback):
    def __init__(self, samples=32, Xct_as_Xbd=False, quant_grid_depth=4,
                 decoder_resolution=128, vocab_size=4096, max_length=512,
                 end_tokens=(4096, 4096), resolution=(256, 256), vis_Ytg=True,
                 chunk=65536, **kwargs):
        super().__init__(**kwargs)
        self.Xct_as_Xbd = Xct_as_Xbd
        self.quant_grid_depth = quant_grid_depth
        self.decoder_resolution = decoder_resolution
        self.vocab_size = vocab_size
        self.max_length = max_length
        self.end_tokens = tuple(end_tokens)
        self.resolution = tuple(resolution)
        self.vis_Ytg = vis_Ytg
        self.chunk = chunk
        self.all_Xtg = makeGrid([-1, -1, -1.0], [1.0, 1, 1],
                                [decoder_resolution] * 3,
                                indexing="ij").astype(np.float32)
        self._jitted = None

    def _compute_fn(self, model):
        chunk = min(self.chunk, self.all_Xtg.shape[0])

        def fn(variables, Xbd, Xtg):
            quant_ind, mode, encoded = model.apply(
                variables, Xbd, method=VQDIF.quantize_cloud)
            seq, mode = sparse_ops.dense2sparse(
                quant_ind, self.max_length, self.end_tokens, self.vocab_size,
                mode=mode)
            dense = sparse_ops.sparse2dense(seq, mode,
                                            2 ** self.quant_grid_depth)
            logits = model.apply(variables, dense, Xtg, chunk,
                                 method=VQDIF.decode_index_chunked)["logits"]
            return dict(logits=logits, quant_ind=quant_ind, sparse=seq,
                        grid_mask=encoded["grid_mask"], mode=mode)
        return jax.jit(fn)

    def compute_batch(self, batch, input_name=""):
        model = self.system.model
        variables = self.system.variables(self.state)
        if self._jitted is None:
            self._jitted = self._compute_fn(model)
        Xbd = batch["Xbd"] if ("Xbd" in batch and not self.Xct_as_Xbd) \
            else batch["Xct"]
        out = self._jitted(variables, jnp.asarray(Xbd),
                           jnp.asarray(self.all_Xtg[None]))
        out = {k: np.asarray(v) for k, v in out.items()}
        out["batch"] = batch
        return out

    def visualize_batch(self, computed, input_name=""):
        batch = computed["batch"]
        occupancy = sigmoid(computed["logits"].reshape(-1))
        imgs = {}
        cam = {}
        if "Xbd" in batch:
            imgs["gt_pc"] = visutil.render_cloud(batch["Xbd"][0],
                                                 resolution=self.resolution)
        if "Xct" in batch:
            imgs["data_pc_p"] = visutil.render_cloud(
                batch["Xct"][0], resolution=self.resolution)
        vert, face = geoutil.array2mesh(occupancy, thresh=0.5,
                                        coords=self.all_Xtg)
        imgs["recon"] = visutil.render_mesh(vert, face,
                                            resolution=self.resolution)
        geoutil.write_mesh(self.data_dir, vert, face, input_name=input_name)
        eval_dir = os.path.join(self.data_dir, "eval")
        os.makedirs(eval_dir, exist_ok=True)
        eval_pc = geoutil.sampleMesh(vert, face, sampleN=10 ** 5)
        np.savez(os.path.join(eval_dir, f"{input_name}.npz"), eval_pc=eval_pc)

        seq = computed["sparse"][0]
        real = sparse_ops.filter_end_tokens(seq, self.end_tokens)
        imgs["quant_ind"] = visutil.render_voxel_indices(
            real[:, 0], real[:, 1], depth=self.quant_grid_depth,
            val_max=self.vocab_size, resolution=self.resolution)
        mask_pos = np.where(computed["grid_mask"][0].reshape(-1))[0]
        imgs["mask_ind"] = visutil.render_voxel_indices(
            mask_pos, mask_pos, depth=self.quant_grid_depth,
            val_max=(2 ** self.quant_grid_depth) ** 3,
            resolution=self.resolution)
        return imgs


class VisRecon3D(VisCallback):
    """Plain encode->decode reconstruction callback (vqdif.py:170-212)."""

    def __init__(self, samples=32, quant_grid_depth=4, vocab_size=4096,
                 decoder_resolution=128, resolution=(256, 256), chunk=65536,
                 **kwargs):
        super().__init__(**kwargs)
        self.quant_grid_depth = quant_grid_depth
        self.vocab_size = vocab_size
        self.resolution = tuple(resolution)
        self.chunk = chunk
        self.all_Xtg = makeGrid([-1, -1, -1.0], [1.0, 1, 1],
                                [decoder_resolution] * 3,
                                indexing="ij").astype(np.float32)
        self._jitted = None

    def compute_batch(self, batch, input_name=""):
        model = self.system.model
        variables = self.system.variables(self.state)
        if self._jitted is None:
            self._jitted = jax.jit(
                lambda v, Xbd, Xtg: model.apply(v, Xbd, Xtg, train=False))
        out = self._jitted(variables, jnp.asarray(batch["Xbd"]),
                           jnp.asarray(self.all_Xtg[None]))
        return dict(logits=np.asarray(out["logits"]),
                    quant_ind=np.asarray(out["quant_ind"]), batch=batch)

    def visualize_batch(self, computed, input_name=""):
        occupancy = sigmoid(computed["logits"].reshape(-1))
        vert, face = geoutil.array2mesh(occupancy, thresh=0.5,
                                        coords=self.all_Xtg)
        imgs = {"recon": visutil.render_mesh(vert, face,
                                             resolution=self.resolution)}
        if "Xbd" in computed["batch"]:
            imgs["gt_pc"] = visutil.render_cloud(
                computed["batch"]["Xbd"][0], resolution=self.resolution)
        return imgs
