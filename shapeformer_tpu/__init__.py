"""shapeformer_tpu: a TPU-native (JAX / XLA / Pallas / pjit) 3D shape-completion framework.

Re-implements, TPU-first, the full capability surface of QhelDIV/ShapeFormer
(arXiv 2201.10326): the VQDIF point-cloud -> sparse-voxel VQ implicit autoencoder,
the ShapeFormer conditional tuple-factorized autoregressive transformer, and the
surrounding experiment runner / config / data / visualization subsystems.

Layout (mirrors the reference layer map, SURVEY.md section 1):
  config.py     -- YAML + inherit_from + dotted-path registry (ref: xgutils/optutil.py)
  trainer.py    -- CLI experiment runner       (ref: shapeformer/trainer.py)
  datamodule.py -- dataset plumbing            (ref: shapeformer/datamodule.py)
  data/         -- IMNet/DFAUST/demo datasets, partial-cloud selectors
  models/       -- VQDIF + ShapeFormer (flax.linen, channels-last)
  ops/          -- device ops: scatter pooling, trilinear sampling, sparse codec,
                   vectorized top-k/top-p, Pallas kernels
  parallel/     -- jax.sharding mesh + pjit train/sample steps
  utils/        -- host-side numpy/geometry utilities, C++ marching cubes binding
  callbacks/    -- generation/visualization callbacks
"""

__version__ = "0.1.0"
