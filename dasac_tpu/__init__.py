"""dasac_tpu — a TPU-native (JAX/XLA/Pallas) framework with the capabilities of
visinf/da-sac: self-supervised augmentation-consistency domain adaptation for
semantic segmentation (GTA5/SYNTHIA -> Cityscapes).

Layer map (see SURVEY.md for the reference analysis):
  core/   config system, mesh/sharding setup, train-state pytree
  data/   class taxonomy, split lists, id mappers, importance sampler, host loader
  aug/    device-side augmentation engine (affine warps + photometric kernels)
  nn/     flax models: DeepLabv2 (ResNet-101 / VGG-16), FCN8s (VGG-16), sync BN
  sac/    the adaptation algorithm as pure functions (EMA teacher, running conf,
          pseudo-labels, focal CE, multi-view refinement)
  train/  pjit/shard_map train+eval steps, optimizer groups, loop, checkpoints
  infer/  single/multi-scale inference and Cityscapes PNG export
  tools/  offline tools (importance-sampling weights, trainId conversion)
"""

__version__ = "0.1.0"
