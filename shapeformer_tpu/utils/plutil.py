"""Training-callback utilities under the reference module path.

The reference keeps its VisCallback framework and the interactive smoke
harness in xgutils/plutil.py; the canonical implementations here live in
shapeformer_tpu.callbacks.base, and debug_model/test_batch are re-expressed
for the functional systems (plutil.py:301-339)."""
from __future__ import annotations

import traceback

import jax

from ..callbacks.base import (VisCallback,  # noqa: F401
                              get_effective_visual_indices)


def test_batch(system, state, train_dloader, val_dloader):
    """One train step + one val step; the 'does it even step' check
    (plutil.test_batch, plutil.py:317-339)."""
    train_batch = next(iter(train_dloader))
    val_batch = next(iter(val_dloader))
    rng = jax.random.PRNGKey(0)
    state, metrics = system.train_step(state, train_batch, rng)
    print("Batch 0 train loss:", float(metrics["loss"]))
    metrics = system.eval_step(state, val_batch, rng)
    print("Batch 0 val loss:", float(metrics["loss"]))
    return state


def debug_model(trainer, resume=False, load_compute=False,
                skip_batch_test=False):
    """Load a Trainer's model/data, run one train+val batch, then every
    visualization callback once — the interactive whole-pipeline smoke check
    (plutil.debug_model, plutil.py:301-316)."""
    trainer.data_module.setup()
    train_dloader = trainer.data_module.train_dataloader()
    val_dloader = trainer.data_module.val_dataloader()
    system = trainer._build_system(max(len(train_dloader), 1))
    sample = next(iter(train_dloader))
    state = system.create_state(jax.random.PRNGKey(trainer.seed), sample)
    if resume and trainer.resume_from_checkpoint:
        from .. import checkpoint as ckpt_lib
        state = ckpt_lib.restore_checkpoint(trainer.resume_from_checkpoint,
                                            target=state)
    if not skip_batch_test:
        print("Test run train/val step")
        state = test_batch(system, state, train_dloader, val_dloader)
    visual_dloader = trainer.data_module.visual_dataloader()
    for callback in trainer.callbacks:
        callback.load_compute = load_compute
        print("Start callback:", type(callback).__name__)
        try:
            callback.process(system, state, visual_dloader)
        except Exception as err:
            traceback.print_exc()
            print("callback failed, continuing:", err)
    print("Success")
    return system, state
