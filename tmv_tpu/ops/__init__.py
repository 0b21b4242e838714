from tmv_tpu.ops.activations import mish, swish, leaky_relu  # noqa: F401
from tmv_tpu.ops.iou import iou_xyxy, iou_yxyx  # noqa: F401
from tmv_tpu.ops.nms import nms, nms_by_classes  # noqa: F401
