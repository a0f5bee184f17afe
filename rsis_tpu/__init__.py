"""rsis_tpu — a TPU-native recurrent instance segmentation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of imatge-upc/rsis
(arXiv 1712.00617): a CNN skip-pyramid encoder plus a ConvLSTM recurrent
decoder that emits one instance mask + class distribution + stop score per
timestep, trained with Hungarian-matched soft-IoU loss.

Subpackages:
  kernels   — native C++ RLE mask library (encode/decode/iou/merge/...)
  ops       — losses, soft-IoU cost matrices, jittable Hungarian matching
  models    — flax modules: backbones, encoder skip pyramid, ConvLSTM decoder
  data      — dataset catalogs, packed-target builder, on-device augmentation
  parallel  — device mesh and sharding helpers
  train     — pjit train step, curriculum state machine, checkpointing
  evals     — inference forward, COCO-style evaluation, dataset exporters
  utils     — logging, plotting, profiling
"""

__version__ = "0.1.0"
