"""Static-shape greedy NMS (plain / class-aware / score-thresholded).

Capability parity with the reference's three sequential NMS loops —
`AIServer/ai_api/ai_models/utils/tf_iou_utils.py:67-157` (``GetIOUNMS``,
``GetIOUNMSByClasses``) and `efficientnet/utils/nms.py:4-61` (``get_nms``
with a score threshold) — which are dynamic-shape ``tf.while_loop`` +
``boolean_mask`` programs and therefore unrunnable under XLA's static-shape
model.

TPU-native re-design: fixed-capacity inputs with a validity mask.  Boxes are
sorted by score once; a ``fori_loop`` walks the sorted order and maintains a
*suppressed* bitmask.  Each step computes one IoU row (O(N) memory, not the
O(N²) matrix), and a box only suppresses strictly lower-scored boxes when it
is itself kept — exactly the greedy semantics of the reference loops, so the
selected indices and their order match the sequential algorithm 1:1.

Returned indices are padded to ``max_output_size`` with a validity mask.
"""

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from tmv_tpu.ops.iou import iou_xyxy, iou_yxyx

_NEG_INF = float("-inf")

# backend selection: 'auto' uses the fused Pallas sweep on TPU (≈3× faster
# at 1024 candidates than the XLA fori_loop), XLA elsewhere.
# Override with TMV_NMS_BACKEND={auto,xla,pallas}.
_BACKEND = os.environ.get("TMV_NMS_BACKEND", "auto")


def set_nms_backend(backend: str):
    global _BACKEND
    assert backend in ("auto", "xla", "pallas")
    _BACKEND = backend


def _use_pallas(coord: str, iou_type: str,
                backend: Optional[str] = None) -> bool:
    backend = _BACKEND if backend is None else backend
    if backend == "xla":
        return False
    # the Pallas sweep implements xyxy iou/diou (the convention-symmetric
    # cases); yxyx iou/diou are coordinate-order invariant so they map too
    if iou_type not in ("iou", "diou"):
        return False
    if backend == "pallas":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _iou_fn(coord: str, iou_type: str):
    if coord == "xyxy":
        return partial(iou_xyxy, iou_type=iou_type)
    if coord == "yxyx":
        return partial(iou_yxyx, iou_type=iou_type)
    raise ValueError(f"unknown coord convention {coord!r}")


def _greedy_nms(
    boxes: jax.Array,
    scores: jax.Array,
    valid: jax.Array,
    classes: Optional[jax.Array],
    max_output_size: int,
    iou_threshold: float,
    score_threshold: float,
    iou_type: str,
    coord: str,
    backend: Optional[str] = None,
):
    n = boxes.shape[0]

    neg = jnp.where(valid, scores, _NEG_INF)
    order = jnp.argsort(-neg, stable=True)
    boxes_s = boxes[order]
    scores_s = scores[order]
    valid_s = valid[order]
    eligible = valid_s & (scores_s >= score_threshold)
    if classes is not None:
        classes_s = classes[order]

    if _use_pallas(coord, iou_type, backend):
        from tmv_tpu.kernels.nms_pallas import greedy_sweep_pallas

        # plain IoU is coordinate-order invariant; yxyx standard DIoU maps
        # to the kernel's 'diou_std' variant, xyxy keeps the d**0.6 quirk
        kernel_iou = iou_type
        if coord == "yxyx" and iou_type == "diou":
            kernel_iou = "diou_std"
        kept = greedy_sweep_pallas(
            boxes_s, eligible, classes_s if classes is not None else None,
            iou_threshold, kernel_iou,
        )
    else:
        iou = _iou_fn(coord, iou_type)
        idxs = jnp.arange(n)

        def body(i, suppressed):
            keep_i = jnp.logical_and(
                jnp.logical_not(suppressed[i]), eligible[i])
            # IoU of box i vs every box; only later (lower-scored) count.
            row = iou(boxes_s[i][None, :], boxes_s)
            sup = (row >= iou_threshold) & (idxs > i)
            if classes is not None:
                sup = sup & (classes_s == classes_s[i])
            return jnp.where(keep_i, suppressed | sup, suppressed)

        suppressed = jax.lax.fori_loop(
            0, n, body, jnp.zeros((n,), dtype=bool))
        kept = jnp.logical_not(suppressed) & eligible
    # First `max_output_size` kept boxes, in score order (= reference order).
    rank = jnp.cumsum(kept.astype(jnp.int32)) - 1
    kept = kept & (rank < max_output_size)

    # Scatter kept sorted-positions into output slots [0, max_output_size).
    slot = jnp.where(kept, rank, max_output_size)
    out_idx = jnp.zeros((max_output_size + 1,), dtype=jnp.int32).at[slot].set(
        order.astype(jnp.int32), mode="drop"
    )[:max_output_size]
    out_valid = jnp.zeros((max_output_size + 1,), dtype=bool).at[slot].set(
        True, mode="drop"
    )[:max_output_size]
    return out_idx, out_valid


def nms(
    boxes: jax.Array,
    scores: jax.Array,
    valid: Optional[jax.Array] = None,
    max_output_size: int = 500,
    iou_threshold: float = 0.5,
    score_threshold: float = _NEG_INF,
    iou_type: str = "iou",
    coord: str = "xyxy",
    backend: Optional[str] = None,
):
    """Greedy NMS over padded candidates.

    Args:
        boxes: ``(N, 4)`` corner boxes in ``coord`` convention.
        scores: ``(N,)``.
        valid: ``(N,)`` bool padding mask (None = all valid).
        max_output_size: output capacity.
        score_threshold: candidates below it are dropped
            (`efficientnet/utils/nms.py:44` semantics).
        backend: 'auto'/'xla'/'pallas' override for this call — part of the
            trace, unlike the process-global ``set_nms_backend`` (None =
            use the global).

    Returns:
        ``(indices, valid_out)``: int32 ``(max_output_size,)`` indices into the
        input (padded with 0) and a bool mask of real entries, ordered by
        descending score like the reference's sequential loops.
    """
    if valid is None:
        valid = jnp.ones(scores.shape, dtype=bool)
    return _greedy_nms(
        boxes, scores, valid, None, max_output_size, iou_threshold,
        score_threshold, iou_type, coord, backend,
    )


def soft_nms(
    boxes: jax.Array,
    scores: jax.Array,
    valid: Optional[jax.Array] = None,
    max_output_size: int = 500,
    sigma: float = 0.5,
    score_threshold: float = 0.001,
    coord: str = "yxyx",
):
    """Gaussian soft-NMS: decay instead of suppress.

    Capability cover for the reference's vendored ``soft_nms``
    (`utils/nms_np.py`, unused): greedy passes where each selected box
    decays overlapping scores by ``exp(-iou²/sigma)``; boxes falling below
    ``score_threshold`` drop out.  Static shapes: ``max_output_size``
    sequential selections over the padded candidate set.

    Returns (indices, updated_scores, valid_out).
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    iou = _iou_fn(coord, "iou")
    live_scores = jnp.where(valid, scores, _NEG_INF)

    def body(carry, _):
        live, = carry
        top = jnp.argmax(live)
        top_score = live[top]
        ok = top_score >= score_threshold
        row = iou(boxes[top][None, :], boxes)
        decay = jnp.exp(-(row**2) / sigma)
        new_live = jnp.where(ok, live * decay, live)
        new_live = new_live.at[top].set(_NEG_INF)
        out_idx = jnp.where(ok, top, 0).astype(jnp.int32)
        out_score = jnp.where(ok, top_score, 0.0)
        return (new_live,), (out_idx, out_score, ok)

    (_,), (idxs, out_scores, valids) = jax.lax.scan(
        body, (live_scores,), None, length=max_output_size)
    return idxs, out_scores, valids


def nms_by_classes(
    boxes: jax.Array,
    scores: jax.Array,
    classes: jax.Array,
    valid: Optional[jax.Array] = None,
    max_output_size: int = 500,
    iou_threshold: float = 0.5,
    score_threshold: float = _NEG_INF,
    iou_type: str = "iou",
    coord: str = "xyxy",
    backend: Optional[str] = None,
):
    """Class-aware greedy NMS: a box only suppresses boxes of its own class.

    Semantics of ``GetIOUNMSByClasses`` (`utils/tf_iou_utils.py:111-157`).
    """
    if valid is None:
        valid = jnp.ones(scores.shape, dtype=bool)
    return _greedy_nms(
        boxes, scores, valid, classes, max_output_size, iou_threshold,
        score_threshold, iou_type, coord, backend,
    )
