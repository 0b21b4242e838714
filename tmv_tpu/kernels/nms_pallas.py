"""Pallas TPU kernel: fused greedy (class-aware) NMS suppression sweep.

The XLA lowering of the greedy sweep in ``ops.nms`` is a ``fori_loop`` of N
tiny steps — each step re-launches a fused elementwise kernel, so at
N=1024+ candidates the serving p50 is dominated by loop overhead
(SURVEY §7 "hard parts" #6).  This kernel runs the *entire* sweep inside
one ``pallas_call``: boxes live in VMEM as four (1, N) coordinate rows, the
suppression state is a VMEM scratch vector, and each iteration is ~10 VPU
ops on (1, N) lanes — no per-step HBM traffic or launch cost.

Exact same semantics as ``ops.nms._greedy_nms``'s suppression loop: a box
only suppresses strictly-later (lower-scored) boxes when itself kept, with
optional same-class gating.  Sorting/top-k/output compaction stay in XLA
(they're single well-fused ops already).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sweep_kernel(coords_ref, eligible_ref, classes_ref, out_ref,
                  *, n: int, iou_threshold: float, class_aware: bool,
                  iou_type: str):
    """coords: (8, N) rows = x1, y1, x2, y2, (unused pad); eligible: (1, N)
    1.0/0.0; classes: (1, N) float-cast ids; out: (1, N) kept-mask.

    Scalars of the current pivot box are extracted with one-hot masked
    reductions — pure (1, N) VPU ops, no dynamic lane indexing.
    """
    x1 = coords_ref[0:1, :]
    y1 = coords_ref[1:2, :]
    x2 = coords_ref[2:3, :]
    y2 = coords_ref[3:4, :]
    area = (x2 - x1) * (y2 - y1)
    eligible = eligible_ref[0:1, :]
    classes = classes_ref[0:1, :]
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1).astype(jnp.float32)

    def body(i, suppressed):
        i_f = i.astype(jnp.float32)
        onehot = (idx == i_f).astype(jnp.float32)

        def pick(v):
            return jnp.sum(v * onehot)

        keep_i = (1.0 - pick(suppressed)) * pick(eligible)
        bx1 = pick(x1)
        by1 = pick(y1)
        bx2 = pick(x2)
        by2 = pick(y2)
        barea = (bx2 - bx1) * (by2 - by1)
        inter_w = jnp.maximum(
            jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1), 0.0)
        inter_h = jnp.maximum(
            jnp.minimum(y2, by2) - jnp.maximum(y1, by1), 0.0)
        inter = inter_w * inter_h
        iou = inter / (area + barea - inter)
        if iou_type in ("diou", "diou_std"):
            ub_w = jnp.maximum(x2, bx2) - jnp.minimum(x1, bx1)
            ub_h = jnp.maximum(y2, by2) - jnp.minimum(y1, by1)
            c = ub_w * ub_w + ub_h * ub_h
            dcx = (x1 + x2 - bx1 - bx2) * 0.5
            dcy = (y1 + y2 - by1 - by2) * 0.5
            u = dcx * dcx + dcy * dcy
            if iou_type == "diou":
                # reference YOLO DIoU: iou − (u/c)**0.6 (tf_iou_utils.py:50)
                d = u / c
                iou = jnp.where(c == 0.0, iou, iou - d**0.6)
            else:
                # standard DIoU: iou − u/c with divide-no-nan
                # (efficientnet/utils/iou.py:85-95)
                iou = iou - jnp.where(c == 0.0, 0.0, u / jnp.where(
                    c == 0.0, 1.0, c))
        sup = (iou >= iou_threshold) & (idx > i_f)
        if class_aware:
            sup = sup & (classes == pick(classes))
        return jnp.maximum(suppressed, keep_i * sup.astype(jnp.float32))

    suppressed = jax.lax.fori_loop(
        0, n, body, jnp.zeros((1, n), jnp.float32))
    out_ref[0:1, :] = (1.0 - suppressed) * eligible


def greedy_sweep_pallas(
    boxes_sorted: jax.Array,
    eligible: jax.Array,
    classes_sorted: jax.Array | None,
    iou_threshold: float,
    iou_type: str = "iou",
    interpret: bool = False,
):
    """Kept-mask over score-sorted candidates, computed in one TPU kernel.

    Args:
        boxes_sorted: (N, 4) xyxy, descending score order.
        eligible: (N,) bool (valid ∧ score ≥ threshold).
        classes_sorted: optional (N,) int ids for class-aware NMS.

    Returns (N,) bool kept mask.
    """
    n = boxes_sorted.shape[0]
    n_pad = max(128, int(np.ceil(n / 128)) * 128)
    coords = jnp.zeros((8, n_pad), jnp.float32)
    coords = coords.at[0:4, :n].set(boxes_sorted.T.astype(jnp.float32))
    elig = jnp.zeros((1, n_pad), jnp.float32).at[0, :n].set(
        eligible.astype(jnp.float32))
    if classes_sorted is None:
        cls = jnp.zeros((1, n_pad), jnp.float32)
    else:
        cls = jnp.zeros((1, n_pad), jnp.float32).at[0, :n].set(
            classes_sorted.astype(jnp.float32))

    kernel = partial(
        _sweep_kernel, n=n_pad, iou_threshold=iou_threshold,
        class_aware=classes_sorted is not None, iou_type=iou_type,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(coords, elig, cls)
    return out[0, :n] > 0.5


def nms_pallas(
    boxes: jax.Array,
    scores: jax.Array,
    classes: jax.Array | None = None,
    valid: jax.Array | None = None,
    max_output_size: int = 500,
    iou_threshold: float = 0.5,
    score_threshold: float = float("-inf"),
    iou_type: str = "iou",
    interpret: bool = False,
):
    """Drop-in fused variant of ``ops.nms.nms``/``nms_by_classes``.

    Same return convention: (indices, valid_out) padded to
    ``max_output_size``, score-descending.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    neg = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-neg, stable=True)
    boxes_s = boxes[order]
    scores_s = scores[order]
    valid_s = valid[order]
    eligible = valid_s & (scores_s >= score_threshold)
    classes_s = classes[order] if classes is not None else None

    kept = greedy_sweep_pallas(
        boxes_s, eligible, classes_s, iou_threshold, iou_type, interpret)

    rank = jnp.cumsum(kept.astype(jnp.int32)) - 1
    kept = kept & (rank < max_output_size)
    slot = jnp.where(kept, rank, max_output_size)
    out_idx = jnp.zeros((max_output_size + 1,), jnp.int32).at[slot].set(
        order.astype(jnp.int32), mode="drop")[:max_output_size]
    out_valid = jnp.zeros((max_output_size + 1,), bool).at[slot].set(
        True, mode="drop")[:max_output_size]
    return out_idx, out_valid
