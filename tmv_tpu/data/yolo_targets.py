"""YOLO grid-target assignment, static-shape (replaces GetTargets).

Parity surface: `datasets/coco_dataset.py:185-285` — per GT box, pick the
best anchor by IoU of the centered (wh) rectangles over all 9 anchors,
derive (layer, cell_y, cell_x, anchor) and scatter
``[cx, cy, w, h, 1, one_hot]`` into the per-scale grids; boxes whose
scatter targets collide are zeroed afterwards (the ``obj <= 1`` de-dup at
`:278-284`).  Reference quirks replicated: the box center uses *floor
division* (``(x1+x2) // 2``, `:193`), and the best-anchor flat index is
split with the scale count (valid because anchors-per-scale == 3 == scales).

TPU re-design: the per-box ``tf.while_loop`` + ``TensorArray`` + dynamic
``scatter_nd`` becomes one vectorized scatter-add over a fixed
``max_boxes`` capacity with a validity mask — jit/vmap-friendly.
"""

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def make_yolo_targets(
    boxes: jax.Array,
    classes: jax.Array,
    valid: jax.Array,
    anchors_wh: np.ndarray,
    image_wh: Tuple[int, int],
    classes_num: int,
):
    """Single image: padded GT boxes → per-scale grid targets.

    Args:
        boxes: ``(max_boxes, 4)`` xyxy pixel boxes (letterboxed image space).
        classes: ``(max_boxes,)`` int ids.
        valid: ``(max_boxes,)`` bool.
        anchors_wh: ``(scales, A, 2)`` pixel anchors (scale 0 = coarsest).
        image_wh: (W, H).

    Returns tuple over scales of ``(h, w, A, 5+classes_num)`` targets.
    """
    anchors_wh = np.asarray(anchors_wh, np.float32)
    scales, a_num = anchors_wh.shape[0], anchors_wh.shape[1]
    image_wh_f = jnp.asarray(image_wh, jnp.float32)
    layers_hw = [
        (image_wh[1] // s, image_wh[0] // s) for s in (32, 16, 8)[:scales]
    ]

    # centers with the reference's floor-division quirk
    boxes_xy = jnp.floor_divide(boxes[:, 2:4] + boxes[:, 0:2], 2.0)
    boxes_wh = boxes[:, 2:4] - boxes[:, 0:2]
    boxes_xy = boxes_xy / image_wh_f
    boxes_wh = boxes_wh / image_wh_f

    # best anchor by centered IoU (intersection of wh rectangles)
    flat_anchors = jnp.asarray(anchors_wh.reshape(-1, 2))  # (9, 2) pixels
    inter = jnp.minimum(
        boxes_wh[:, None, :] * image_wh_f, flat_anchors[None, :, :]
    )
    inter_area = inter[..., 0] * inter[..., 1]
    box_area = (boxes_wh[:, 0] * image_wh_f[0]) * (boxes_wh[:, 1] * image_wh_f[1])
    anchor_area = flat_anchors[:, 0] * flat_anchors[:, 1]
    iou = inter_area / (box_area[:, None] + anchor_area[None, :] - inter_area)
    anchors_idx = jnp.argmax(iou, axis=-1).astype(jnp.int32)
    layer_index = anchors_idx // a_num
    anchor_index = anchors_idx % a_num

    one_hot = jax.nn.one_hot(classes, classes_num, dtype=jnp.float32)
    updates = jnp.concatenate(
        [boxes_xy, boxes_wh, jnp.ones_like(boxes_xy[:, :1]), one_hot], axis=-1
    )
    updates = updates * valid[:, None].astype(jnp.float32)

    targets = []
    for li, (gh, gw) in enumerate(layers_hw):
        grid_hw = jnp.asarray([gh, gw], jnp.float32)
        cell = jnp.floor(boxes_xy[:, ::-1] * grid_hw).astype(jnp.int32)
        in_layer = valid & (layer_index == li)
        # drop invalid via out-of-range index + mode='drop'
        y_idx = jnp.where(in_layer, cell[:, 0], gh)
        x_idx = jnp.where(in_layer, cell[:, 1], gw)
        t = jnp.zeros((gh + 1, gw + 1, a_num, 5 + classes_num), jnp.float32)
        t = t.at[y_idx, x_idx, anchor_index].add(
            updates * in_layer[:, None], mode="drop"
        )[:gh, :gw]
        # de-dup: collided cells (obj summed > 1) are zeroed
        dedup = (t[..., 4:5] <= 1.0).astype(jnp.float32)
        targets.append(t * dedup)
    return tuple(targets)


def pad_labels(boxes: np.ndarray, classes: Sequence[int], max_boxes: int):
    """Host-side: pad variable GT lists to (max_boxes, …) + mask."""
    n = min(len(classes), max_boxes)
    out_boxes = np.zeros((max_boxes, 4), np.float32)
    out_classes = np.zeros((max_boxes,), np.int32)
    out_valid = np.zeros((max_boxes,), bool)
    if n:
        out_boxes[:n] = boxes[:n]
        out_classes[:n] = np.asarray(classes[:n], np.int32)
        out_valid[:n] = True
    return out_boxes, out_classes, out_valid
