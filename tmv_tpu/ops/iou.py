"""IoU families in both of the reference's coordinate conventions.

The reference carries two independent IoU implementations with different
conventions and different DIoU definitions; both matter for numeric parity:

- ``iou_xyxy``: the YOLO-side kernel
  (`AIServer/ai_api/ai_models/utils/tf_iou_utils.py:5-65`), corner format
  ``(x1, y1, x2, y2)``; its DIoU uses the repo's non-standard exponent
  ``iou - (u/c) ** 0.6`` and its CIoU uses ``atan(w/h)`` without a
  divide-by-zero guard.  Replicated exactly (quirks included).

- ``iou_yxyx``: the EfficientDet-side kernel
  (`efficientnet/utils/iou.py:26-100`), corner format ``(y1, x1, y2, x2)``
  with clamped widths/heights, ``divide_no_nan`` semantics, GIoU support,
  standard DIoU (squared-diagonal normalizer), and a custom gradient for the
  CIoU aspect-ratio term.

Both are pure broadcasting jnp — XLA maps them onto the VPU and fuses them
into callers (loss, NMS, anchor matching).
"""

import math
from functools import partial

import jax
import jax.numpy as jnp


def _div_no_nan(a, b):
    """TF ``divide_no_nan``: 0 where the denominator is 0."""
    return jnp.where(b == 0, 0.0, a / jnp.where(b == 0, 1.0, b))


def iou_xyxy(b1: jax.Array, b2: jax.Array, iou_type: str = "iou") -> jax.Array:
    """Broadcasted IoU/DIoU/CIoU over corner boxes ``(..., 4)`` in xyxy order.

    Typical call: ``b1: (..., N, 1, 4)``, ``b2: (1, M, 4)`` → ``(..., N, M)``.
    """
    assert iou_type in ("iou", "diou", "ciou")
    inter_mins = jnp.maximum(b1[..., 0:2], b2[..., 0:2])
    inter_maxes = jnp.minimum(b1[..., 2:4], b2[..., 2:4])
    inter_wh = jnp.maximum(inter_maxes - inter_mins, 0.0)
    inter_area = inter_wh[..., 0] * inter_wh[..., 1]
    b1_wh = b1[..., 2:4] - b1[..., 0:2]
    b2_wh = b2[..., 2:4] - b2[..., 0:2]
    b1_area = b1_wh[..., 0] * b1_wh[..., 1]
    b2_area = b2_wh[..., 0] * b2_wh[..., 1]
    iou = inter_area / (b1_area + b2_area - inter_area)
    if iou_type == "iou":
        return iou

    # smallest enclosing box
    ub_mins = jnp.minimum(b1[..., 0:2], b2[..., 0:2])
    ub_maxes = jnp.maximum(b1[..., 2:4], b2[..., 2:4])
    ub_wh = ub_maxes - ub_mins
    c = jnp.square(ub_wh[..., 0]) + jnp.square(ub_wh[..., 1])
    b1_xy = (b1[..., 2:4] + b1[..., 0:2]) / 2
    b2_xy = (b2[..., 2:4] + b2[..., 0:2]) / 2
    u = jnp.sum(jnp.square(b1_xy - b2_xy), axis=-1)
    d = u / c
    # Reference quirk: distance term is d**0.6 (tf_iou_utils.py:50), not d.
    diou = iou - d**0.6
    diou = jnp.where(c == 0.0, iou, diou)
    if iou_type == "diou":
        return diou

    v = (
        4
        / math.pi**2
        * jnp.square(
            jnp.arctan(b1_wh[..., 0] / b1_wh[..., 1])
            - jnp.arctan(b2_wh[..., 0] / b2_wh[..., 1])
        )
    )
    alpha = v / (1 - iou + v + 1e-8)
    # Note: reference CIoU uses plain d here, not d**0.6 (tf_iou_utils.py:60).
    ciou = iou - (d + alpha * v)
    return jnp.where(c == 0.0, iou, ciou)


@partial(jax.custom_vjp, nondiff_argnums=())
def _ciou_v(b1_hw: jax.Array, b2_hw: jax.Array) -> jax.Array:
    """CIoU aspect-ratio consistency ``v`` with the reference's custom grad.

    Mirrors `efficientnet/utils/iou.py:5-24`: forward uses
    ``4/pi^2 (atan(w1/h1) - atan(w2/h2))^2`` with divide-no-nan; backward
    w.r.t. the *predicted* box (b2) uses the simplified gradient
    ``dv/dw = 8*arctan*h/pi^2``, ``dv/dh = -8*arctan*w/pi^2`` (the 1/(h²+w²)
    factor dropped, as in the CIoU paper / automl implementation).
    """
    arctan = jnp.arctan(_div_no_nan(b1_hw[1], b1_hw[0])) - jnp.arctan(
        _div_no_nan(b2_hw[1], b2_hw[0])
    )
    return 4.0 * (arctan / math.pi) ** 2


def _ciou_v_fwd(b1_hw, b2_hw):
    arctan = jnp.arctan(_div_no_nan(b1_hw[1], b1_hw[0])) - jnp.arctan(
        _div_no_nan(b2_hw[1], b2_hw[0])
    )
    v = 4.0 * (arctan / math.pi) ** 2
    return v, (arctan, b2_hw)


def _ciou_v_bwd(res, dv):
    arctan, b2_hw = res
    h, w = b2_hw[0], b2_hw[1]
    gdw = dv * 8.0 * arctan * h / (math.pi**2)
    gdh = -dv * 8.0 * arctan * w / (math.pi**2)
    zeros = (jnp.zeros_like(gdh), jnp.zeros_like(gdw))
    return (zeros, (gdh, gdw))


_ciou_v.defvjp(_ciou_v_fwd, _ciou_v_bwd)


def iou_yxyx(boxes1: jax.Array, boxes2: jax.Array, iou_type: str = "iou") -> jax.Array:
    """Broadcasted iou/giou/diou/ciou over ``(..., [y1, x1, y2, x2])`` boxes.

    `boxes1` is the target, `boxes2` the prediction (matters only for the
    CIoU custom gradient).  Matches `efficientnet/utils/iou.py:26-100`.
    """
    assert iou_type in ("iou", "giou", "diou", "ciou")
    b1_ymin, b1_xmin, b1_ymax, b1_xmax = (boxes1[..., i] for i in range(4))
    b2_ymin, b2_xmin, b2_ymax, b2_xmax = (boxes2[..., i] for i in range(4))

    b1_width = jnp.maximum(0.0, b1_xmax - b1_xmin)
    b1_height = jnp.maximum(0.0, b1_ymax - b1_ymin)
    b2_width = jnp.maximum(0.0, b2_xmax - b2_xmin)
    b2_height = jnp.maximum(0.0, b2_ymax - b2_ymin)
    b1_area = b1_width * b1_height
    b2_area = b2_width * b2_height

    inter_ymin = jnp.maximum(b1_ymin, b2_ymin)
    inter_xmin = jnp.maximum(b1_xmin, b2_xmin)
    inter_ymax = jnp.minimum(b1_ymax, b2_ymax)
    inter_xmax = jnp.minimum(b1_xmax, b2_xmax)
    inter_area = jnp.maximum(0.0, inter_xmax - inter_xmin) * jnp.maximum(
        0.0, inter_ymax - inter_ymin
    )

    union_area = b1_area + b2_area - inter_area
    iou_v = _div_no_nan(inter_area, union_area)
    if iou_type == "iou":
        return iou_v

    enclose_ymin = jnp.minimum(b1_ymin, b2_ymin)
    enclose_xmin = jnp.minimum(b1_xmin, b2_xmin)
    enclose_ymax = jnp.maximum(b1_ymax, b2_ymax)
    enclose_xmax = jnp.maximum(b1_xmax, b2_xmax)

    if iou_type == "giou":
        enclose_area = jnp.maximum(0.0, enclose_xmax - enclose_xmin) * jnp.maximum(
            0.0, enclose_ymax - enclose_ymin
        )
        return iou_v - _div_no_nan(enclose_area - union_area, enclose_area)

    euclidean_sq = ((b2_ymin + b2_ymax) / 2 - (b1_ymin + b1_ymax) / 2) ** 2 + (
        (b2_xmin + b2_xmax) / 2 - (b1_xmin + b1_xmax) / 2
    ) ** 2
    diag_sq = (enclose_ymax - enclose_ymin) ** 2 + (enclose_xmax - enclose_xmin) ** 2
    diou_v = iou_v - _div_no_nan(euclidean_sq, diag_sq)
    if iou_type == "diou":
        return diou_v

    v = _ciou_v((b1_height, b1_width), (b2_height, b2_width))
    alpha = _div_no_nan(v, (1 - iou_v) + v)
    return diou_v - alpha * v
