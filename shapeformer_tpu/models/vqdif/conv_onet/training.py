"""ConvONet Trainer remnant (conv_onet/training.py:12-142 — vestigial
upstream; functional re-expression for parity).

train_step/eval_step mirror the BCE-occupancy loop; eval reports IoU at the
threshold via ops.metrics.compute_iou.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ....ops.metrics import compute_iou


class Trainer:
    """Occupancy-network train/eval steps (reference training.py:12)."""

    def __init__(self, model, tx=None, input_type="pointcloud",
                 threshold=0.5, eval_sample=False):
        self.model = model
        self.tx = tx or optax.adam(1e-4)
        self.input_type = input_type
        self.threshold = threshold
        self.eval_sample = eval_sample
        self._step = jax.jit(self._train_step_impl, donate_argnums=(0,))

    def create_state(self, rng, sample_data):
        params = self.model.init(rng, jnp.asarray(sample_data["points"]),
                                 jnp.asarray(sample_data["inputs"]))
        return dict(params=params, opt_state=self.tx.init(params["params"]),
                    step=jnp.int32(0))

    def compute_loss(self, params, data):
        logits = self.model.apply(params, jnp.asarray(data["points"]),
                                  jnp.asarray(data["inputs"]))
        occ = jnp.asarray(data["points.occ"], jnp.float32)
        return optax.sigmoid_binary_cross_entropy(
            logits.astype(jnp.float32), occ).mean()

    def _train_step_impl(self, state, data):
        loss, grads = jax.value_and_grad(
            lambda p: self.compute_loss(p, data))(state["params"])
        updates, opt_state = self.tx.update(grads["params"],
                                            state["opt_state"],
                                            state["params"]["params"])
        params = {"params": optax.apply_updates(state["params"]["params"],
                                                updates)}
        return dict(params=params, opt_state=opt_state,
                    step=state["step"] + 1), loss

    def train_step(self, state, data):
        state, loss = self._step(state, {k: jnp.asarray(v)
                                         for k, v in data.items()})
        return state, float(loss)

    def eval_step(self, state, data):
        logits = self.model.apply(state["params"],
                                  jnp.asarray(data["points_iou"]),
                                  jnp.asarray(data["inputs"]))
        probs = jax.nn.sigmoid(np.asarray(logits, np.float32))
        occ_iou = np.asarray(data["points_iou.occ"]) >= 0.5
        iou = compute_iou(probs >= self.threshold, occ_iou).mean()
        return {"loss": float(self.compute_loss(state["params"], data)
                              if "points.occ" in data else np.nan),
                "iou": float(iou)}
