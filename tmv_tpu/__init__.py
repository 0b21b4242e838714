"""tmv_tpu — a TPU-native (JAX/XLA/Pallas/pjit) machine-vision framework.

A from-scratch rebuild of the capabilities of tfwcn/tensorflow2-machine-vision
(TF2/Keras model zoo: YOLOv3/v4, EfficientDet, FaceNet, UNet, MoCo,
teacher-student distillation, plus an HTTP serving layer) designed TPU-first:

- pure-function flax models with explicit param/state pytrees,
- static shapes everywhere (padded boxes + validity masks instead of the
  reference's dynamic ``boolean_mask``/``TensorArray`` patterns),
- data-parallel scaling via ``jax.sharding.Mesh`` + ``shard_map`` collectives,
- Pallas kernels for hot ops that XLA does not already fuse well.

Subpackages
-----------
core      config system, checkpointing, train-state, RNG and mesh utilities
ops       IoU/NMS/anchors/box-codecs/losses/mAP — the numeric parity layer
models    the model zoo (unet, yolo_v3, yolo_v4, efficientdet, facenet, moco, …)
data      label parsers, samplers, device-side augmentation pipelines
parallel  mesh construction and data-parallel train steps
serving   HTTP endpoint with the reference's JSON contract
kernels   Pallas TPU kernels
"""

__version__ = "0.1.0"
