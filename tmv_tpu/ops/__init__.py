from tmv_tpu.ops.activations import leaky_relu, mish, swish  # noqa: F401
from tmv_tpu.ops.anchors import Anchors, get_feat_sizes  # noqa: F401
from tmv_tpu.ops.iou import iou_xyxy, iou_yxyx  # noqa: F401
from tmv_tpu.ops.losses import (  # noqa: F401
    box_loss,
    class_focal_loss,
    focal_loss,
    focus_loss,
    huber,
    l2_regularization,
    moco_info_nce_loss,
    sigmoid_cross_entropy,
    smooth_l1_loss,
    triplet_loss,
)
from tmv_tpu.ops.map_eval import get_ap, get_ap_voc, get_map, get_map_one  # noqa: F401
from tmv_tpu.ops.nms import nms, nms_by_classes, set_nms_backend, soft_nms  # noqa: F401
from tmv_tpu.ops.regularizers import drop_block, drop_connect, disout  # noqa: F401
from tmv_tpu.ops.soft_label import SoftLabel, gaussian_kernel_2d  # noqa: F401
from tmv_tpu.ops.yolo import decode_boxes, nms_boxes, yolo_loss  # noqa: F401
