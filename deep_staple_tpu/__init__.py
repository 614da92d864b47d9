"""deep_staple_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of multimodallearning/deep_staple (DeepSTAPLE, Weihsbach et al.,
WBIR 2022).

The framework learns per-sample label trustworthiness ("data parameters") for
multi-atlas segmentation under domain shift, and fuses noisy atlas labels into
a consensus via data-parameter-weighted voxel voting, benchmarked against a
first-party STAPLE EM implementation.

Layers (mirroring the reference layer map, SURVEY.md §1):
  core/       config dataclasses, determinism, pytree utilities
  ops/        pure-JAX numerics: dice, resampling, grid sampling, augmentation,
              MIND-SSC, 2D/3D restacking
  models/     MobileNet-LRASPP 3D (Flax) and the 2D variant
  data/       first-party NIfTI I/O, CrossMoDa loader, synthetic fixtures,
              label-disturbance engine
  train/      fused CE+data-parameter train step, optimizers, driver,
              checkpointing, snapshot export
  consensus/  DP weighted voting + native STAPLE EM
  parallel/   mesh/sharding setup, data-parallel + spatially-sharded training
  utils/      metric writers (wandb-compatible + JSONL), visualization
  tools/      preprocessing CLIs (level builder, nnU-Net exporters)
"""

__version__ = "0.1.0"
