"""torch_detection_tpu: a TPU-native (JAX/XLA/Pallas/pjit) object-detection
framework providing the capabilities of the mmdetection-derived reference
TCGGroup/Torch_Detection, re-designed TPU-first.

Layering (see SURVEY.md):
  utils/     foundation: registry, config, file IO, misc
  data/      host-side pipeline: COCO/VOC datasets, transforms, samplers, batching
  models/    flax model zoo: backbones, necks, heads, detectors, torch import
  ops/       on-device detection ops: anchors, IoU, deltas, NMS, preprocessing
  parallel/  mesh construction + sharded train/eval steps (pjit/shard_map)
  engine/    trainer, evaluator (COCO mAP), TTA, checkpoints, profiling
"""

__version__ = "0.1.0"
