"""YOLO head math: loss, grid decode, and the predict/NMS orchestration.

Capability parity with `AIServer/ai_api/ai_models/utils/tf_yolo_utils.py`:

- ``yolo_loss``    — `tf_yolo_utils.py:6-127` (``GetLoss``): per-scale grid
  decode, best-IoU ignore mask (< 0.5 ⇒ background), BCE xy/obj/class +
  ½·MSE wh with the ``2 − w·h`` box-size weighting, summed over scales and
  divided by batch size.
- ``decode_boxes`` — `tf_yolo_utils.py:129-167` (``GetBoxes``): sigmoid+grid
  xy, exp·anchor wh, sigmoid conf/class, invalid-box mask.
- ``nms_boxes``    — `tf_yolo_utils.py:169-269` (``GetNMSBoxes``): threshold,
  concat scales, class-aware NMS, ≤500 outputs.

TPU re-design decisions:

- The reference's per-batch ``tf.while_loop`` + ``boolean_mask`` ignore-mask
  (`tf_yolo_utils.py:77-97`) becomes one batched IoU against a fixed-capacity
  top-k extraction of the ground-truth boxes — a single fused
  einsum-shaped computation, no loops.
- ``boolean_mask`` box filtering becomes score masking (-inf) + top-k
  pre-NMS candidate selection, keeping every shape static for XLA.
"""

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from tmv_tpu.ops.iou import iou_xyxy
from tmv_tpu.ops.losses import sigmoid_cross_entropy
from tmv_tpu.ops.nms import nms_by_classes


def _grid_xy(grid_h: int, grid_w: int, dtype=jnp.float32) -> jax.Array:
    """(grid_h, grid_w, 1, 2) grid of (x, y) cell indices."""
    gx = jax.lax.broadcasted_iota(dtype, (grid_h, grid_w), 1)
    gy = jax.lax.broadcasted_iota(dtype, (grid_h, grid_w), 0)
    return jnp.stack([gx, gy], axis=-1)[:, :, None, :]


def yolo_loss(
    y_true: Sequence[jax.Array],
    y_pred: Sequence[jax.Array],
    image_wh: Tuple[int, int],
    anchors_wh: jax.Array,
    iou_thresh: float = 0.5,
    iou_type: str = "iou",
    max_true_boxes: int = 100,
) -> jax.Array:
    """YOLO multi-scale detection loss (``GetLoss`` semantics).

    Args:
        y_true: per scale ``(B, h, w, A, 5+C)`` targets; xy/wh are normalized
            to [0, 1] image coordinates, slot 4 is objectness.
        y_pred: per scale raw head outputs, same shape.
        image_wh: (W, H) of the input image.
        anchors_wh: ``(scales, A, 2)`` anchor (w, h) in pixels.
        max_true_boxes: static capacity for the per-image GT boxes that feed
            the ignore mask (the reference gathers a dynamic count via
            ``boolean_mask``; any image with more GTs than this in one scale
            would differ — 100 matches the data pipeline's max_boxes).

    Returns scalar loss (sum over scales, mean over batch).
    """
    image_wh_f = jnp.asarray(image_wh, jnp.float32)
    anchors_wh_f = jnp.asarray(anchors_wh, jnp.float32)
    batch_size = y_true[0].shape[0]
    batch_f = jnp.asarray(batch_size, jnp.float32)

    loss = 0.0
    for layer_index in range(len(y_true)):
        y_true_read = y_true[layer_index]
        y_pred_raw = y_pred[layer_index].reshape(y_true_read.shape)
        grid_h, grid_w = y_pred_raw.shape[1], y_pred_raw.shape[2]
        grid_xy = _grid_xy(grid_h, grid_w)
        grid_wh_f = jnp.asarray([grid_w, grid_h], jnp.float32)

        y_true_object = y_true_read[..., 4:5]
        y_true_classes = y_true_read[..., 5:]
        y_true_read_xy = y_true_read[..., 0:2]
        y_true_raw_xy = y_true_read_xy * grid_wh_f - grid_xy
        y_true_raw_xy = y_true_object * y_true_raw_xy

        y_true_read_wh = y_true_read[..., 2:4]
        y_true_raw_wh = jnp.log(
            (y_true_read_wh * image_wh_f + 1e-8) / anchors_wh_f[layer_index]
        )
        y_true_raw_wh = jnp.where(y_true_object > 0, y_true_raw_wh, 0.0)

        y_pred_object = y_pred_raw[..., 4:5]
        y_pred_classes = y_pred_raw[..., 5:]
        y_pred_raw_xy = y_pred_raw[..., 0:2]
        y_pred_read_xy = (jax.nn.sigmoid(y_pred_raw_xy) + grid_xy) / grid_wh_f
        y_pred_raw_wh = y_pred_raw[..., 2:4]
        y_pred_read_wh = (
            jnp.exp(y_pred_raw_wh) * anchors_wh_f[layer_index] / image_wh_f
        )

        # corner boxes in normalized image coords
        t_half = y_true_read_wh / 2
        y_true_boxes = jnp.concatenate(
            [y_true_read_xy - t_half, y_true_read_xy + t_half], axis=-1
        )
        p_half = y_pred_read_wh / 2
        y_pred_boxes = jnp.concatenate(
            [y_pred_read_xy - p_half, y_pred_read_xy + p_half], axis=-1
        )

        # ---- ignore mask: best IoU of each prediction vs the image's GT boxes
        # (replaces the reference's per-batch while_loop + boolean_mask,
        # tf_yolo_utils.py:77-97, with one fixed-capacity batched IoU).
        # GT extraction uses cumsum-compaction scatter instead of top_k —
        # a TPU sort over h·w·A elements costs ~10× the whole backbone.
        obj_flat = y_true_object[..., 0].reshape(batch_size, -1)  # (B, hwA)
        boxes_flat = y_true_boxes.reshape(batch_size, -1, 4)
        k = min(max_true_boxes, obj_flat.shape[1])

        def compact(obj_row, boxes_row):
            is_gt = obj_row > 0
            slots = jnp.where(is_gt, jnp.cumsum(is_gt) - 1, k)
            gt_b = jnp.zeros((k + 1, 4), boxes_row.dtype).at[slots].set(
                boxes_row, mode="drop")[:k]
            gt_v = jnp.zeros((k + 1,), bool).at[slots].set(
                is_gt, mode="drop")[:k]
            return gt_b, gt_v

        gt_boxes, gt_valid = jax.vmap(compact)(obj_flat, boxes_flat)

        pred_flat = y_pred_boxes.reshape(batch_size, -1, 1, 4)
        iou = iou_xyxy(pred_flat, gt_boxes[:, None, :, :], iou_type)  # (B, hwA, k)
        iou = jnp.where(gt_valid[:, None, :], iou, -jnp.inf)
        best_iou = jnp.max(iou, axis=-1)  # (B, hwA); -inf when no GTs
        ignore_mask = (best_iou < iou_thresh).astype(jnp.float32)
        ignore_mask = ignore_mask.reshape(y_true_object.shape)

        # ---- loss terms
        boxes_loss_scale = 2 - y_true_read_wh[..., 0:1] * y_true_read_wh[..., 1:2]
        xy_loss_bc = sigmoid_cross_entropy(y_true_raw_xy, y_pred_raw_xy)
        xy_loss = y_true_object * boxes_loss_scale * xy_loss_bc
        wh_loss = (
            y_true_object
            * boxes_loss_scale
            * 0.5
            * jnp.square(y_true_raw_wh - y_pred_raw_wh)
        )
        object_loss_bc = sigmoid_cross_entropy(y_true_object, y_pred_object)
        object_loss = (
            y_true_object * object_loss_bc
            + (1 - y_true_object) * object_loss_bc * ignore_mask
        )
        classes_loss = y_true_object * sigmoid_cross_entropy(
            y_true_classes, y_pred_classes
        )

        loss += (
            jnp.sum(xy_loss) + jnp.sum(wh_loss) + jnp.sum(object_loss)
            + jnp.sum(classes_loss)
        ) / batch_f
    return loss


def decode_boxes(y: jax.Array, anchors_wh: jax.Array, classes_num: int):
    """Raw head output → normalized corner boxes + sigmoided conf/classes.

    ``GetBoxes`` semantics (`tf_yolo_utils.py:129-167`) with the dynamic
    ``boolean_mask`` replaced by a validity mask (x2 > x1 and y2 > y1).

    Args:
        y: ``(h, w, A, 5+C)`` single-image head output.
        anchors_wh: ``(A, 2)`` anchors normalized by image size.

    Returns:
        (boxes ``(h*w*A, 4)`` xyxy, confidence ``(h*w*A,)``,
         classes ``(h*w*A, C)``, valid ``(h*w*A,)``).
    """
    grid_h, grid_w = y.shape[0], y.shape[1]
    boxes_xy = y[..., 0:2]
    boxes_wh = y[..., 2:4]
    confidence = jax.nn.sigmoid(y[..., 4])
    classes = jax.nn.sigmoid(y[..., 5 : 5 + classes_num])

    grid_xy = _grid_xy(grid_h, grid_w)
    grid_wh_f = jnp.asarray([grid_w, grid_h], jnp.float32)
    read_xy = (jax.nn.sigmoid(boxes_xy) + grid_xy) / grid_wh_f
    read_wh = jnp.exp(boxes_wh) * anchors_wh
    read_wh = jnp.where(jnp.isinf(read_wh), 0.0, read_wh)
    half = read_wh / 2
    boxes = jnp.concatenate([read_xy - half, read_xy + half], axis=-1)
    valid = (boxes[..., 2] > boxes[..., 0]) & (boxes[..., 3] > boxes[..., 1])
    n = grid_h * grid_w * y.shape[2]
    return (
        boxes.reshape(n, 4),
        confidence.reshape(n),
        classes.reshape(n, classes_num),
        valid.reshape(n),
    )


def nms_boxes(
    heads: Sequence[jax.Array],
    anchors_wh: jax.Array,
    image_wh: Tuple[int, int],
    classes_num: int,
    confidence_thresh: float = 0.5,
    scores_thresh: float = 0.3,
    iou_thresh: float = 0.5,
    iou_type: str = "iou",
    max_output_size: int = 500,
    pre_nms_size: Optional[int] = 1024,
    nms_backend: Optional[str] = None,
):
    """Full predict post-process (``GetNMSBoxes``, `tf_yolo_utils.py:169-269`).

    Single image: ``heads`` are per-scale ``(h, w, A*(5+C))`` or
    ``(h, w, A, 5+C)`` outputs.  Candidates failing
    ``conf > confidence_thresh ∧ max_class > scores_thresh`` are masked, the
    top ``pre_nms_size`` by class score enter class-aware NMS (static-shape
    stand-in for the reference's dynamic candidate list).

    Exactness at the cap: with more than ``pre_nms_size`` candidates past
    the thresholds, only the top-``pre_nms_size`` by class score can be
    selected — a candidate outside that set that the sequential reference
    would have kept (it survives because its same-class overlaps were
    suppressed) is dropped.  ``pre_nms_size=None`` removes the cap (every
    candidate enters NMS — exact ``GetNMSBoxes`` semantics at O(N·max_out)
    IoU cost).  Behavior at/above the boundary is pinned by
    ``tests/test_yolo_ops.py::TestPreNmsCap``.

    Returns (boxes, classes_id, scores, classes, confidence, valid), all
    padded to ``max_output_size``.
    """
    image_wh_f = jnp.asarray(image_wh, jnp.float32)
    anchors_wh_f = jnp.asarray(anchors_wh, jnp.float32)
    a_num = anchors_wh_f.shape[1]

    all_boxes, all_conf, all_classes, all_valid = [], [], [], []
    for i, head in enumerate(heads):
        h, w = head.shape[0], head.shape[1]
        head = head.reshape(h, w, a_num, -1)
        boxes, conf, classes, valid = decode_boxes(
            head, anchors_wh_f[i] / image_wh_f, classes_num
        )
        max_cls = jnp.max(classes, axis=-1)
        valid = valid & (conf > confidence_thresh) & (max_cls > scores_thresh)
        all_boxes.append(boxes)
        all_conf.append(conf)
        all_classes.append(classes)
        all_valid.append(valid)

    boxes = jnp.concatenate(all_boxes, axis=0)
    conf = jnp.concatenate(all_conf, axis=0)
    classes = jnp.concatenate(all_classes, axis=0)
    valid = jnp.concatenate(all_valid, axis=0)
    scores = jnp.max(classes, axis=-1)
    classes_id = jnp.argmax(classes, axis=-1).astype(jnp.int32)

    # static pre-NMS candidate selection (None = uncapped, exact)
    k = (scores.shape[0] if pre_nms_size is None
         else min(pre_nms_size, scores.shape[0]))
    masked_scores = jnp.where(valid, scores, -jnp.inf)
    _, cand = jax.lax.top_k(masked_scores, k)
    c_boxes = boxes[cand]
    c_scores = scores[cand]
    c_valid = valid[cand]
    c_ids = classes_id[cand]

    idx, out_valid = nms_by_classes(
        c_boxes,
        c_scores,
        c_ids,
        c_valid,
        max_output_size=max_output_size,
        iou_threshold=iou_thresh,
        iou_type=iou_type,
        coord="xyxy",
        backend=nms_backend,
    )
    sel = cand[idx]
    return (
        boxes[sel],
        classes_id[sel],
        scores[sel],
        classes[sel],
        conf[sel],
        out_valid,
    )
