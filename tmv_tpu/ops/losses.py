"""Loss library for the model zoo.

Capability parity (re-designed, pure-jnp, static shapes):

- ``focal_loss``          — `losses/focal_loss.py:3-52`
- ``box_loss``  (Huber)   — `losses/box_loss.py:3-29`
- ``class_focal_loss``    — `losses/class_loss.py:3-61` (multi-level, masked)
- ``focus_loss``          — `losses/focus_loss.py:3-39` (balanced heatmap MSE)
- ``smooth_l1_loss``      — `utils/smooth_l1_loss.py:4-14`
- ``triplet_loss``        — `facenet/facenet_model.py:177-195` (squared-dist
  semi-hard margin; see also ``euclidean_distance_sq`` at `:112-122`)
- ``moco_info_nce_loss``  — `momentum_contrast/model.py:316-348`
- ``l2_regularization``   — kernel-only weight decay mirroring the regex
  ``.*(kernel|weight):0$`` filter of `efficientnet/efficientdet_net_train.py:41-47`

All classification losses operate on logits (sigmoid applied internally).
"""

from typing import Sequence

import jax
import jax.numpy as jnp


def sigmoid_cross_entropy(labels: jax.Array, logits: jax.Array) -> jax.Array:
    """Elementwise sigmoid CE, numerically stable (tf.nn semantics)."""
    return (
        jnp.maximum(logits, 0.0)
        - logits * labels
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def focal_loss(
    y_true: jax.Array,
    y_pred_logits: jax.Array,
    normalizer: jax.Array,
    alpha: float = 0.25,
    gamma: float = 1.5,
    label_smoothing: float = 0.0,
) -> jax.Array:
    """Elementwise α/γ sigmoid focal loss, divided by ``normalizer``.

    Modulating factors are computed on the *unsmoothed* labels, matching the
    reference (`losses/focal_loss.py:40-52`).  Caller reduces (the reference
    wraps it in a Keras Loss whose default reduction is mean).
    """
    pred_prob = jax.nn.sigmoid(y_pred_logits)
    p_t = y_true * pred_prob + (1 - y_true) * (1 - pred_prob)
    alpha_factor = y_true * alpha + (1 - y_true) * (1 - alpha)
    modulating_factor = (1.0 - p_t) ** gamma
    y_smooth = y_true * (1.0 - label_smoothing) + 0.5 * label_smoothing
    ce = sigmoid_cross_entropy(y_smooth, y_pred_logits)
    return alpha_factor * modulating_factor * ce / normalizer


def huber(y_true: jax.Array, y_pred: jax.Array, delta: float) -> jax.Array:
    """Elementwise Huber loss (quadratic below delta, linear above)."""
    err = y_pred - y_true
    abs_err = jnp.abs(err)
    return jnp.where(
        abs_err <= delta, 0.5 * jnp.square(err), delta * abs_err - 0.5 * delta**2
    )


def box_loss(
    box_targets: jax.Array,
    box_outputs: jax.Array,
    num_positives: jax.Array,
    delta: float = 0.1,
) -> jax.Array:
    """Huber box regression over nonzero targets / (4·num_positives).

    Matches `losses/box_loss.py:22-29` (the zero-target mask doubles as the
    positive-anchor mask because encoded targets of background anchors are
    zeroed).
    """
    normalizer = num_positives * 4.0
    mask = (box_targets != 0.0).astype(box_outputs.dtype)
    loss = huber(box_targets, box_outputs, delta) * mask
    return jnp.sum(loss) / normalizer


def class_focal_loss(
    class_targets: Sequence[jax.Array],
    class_outputs: Sequence[jax.Array],
    masks: Sequence[jax.Array],
    alpha: float,
    gamma: float,
    label_smoothing: float = 0.0,
) -> jax.Array:
    """Multi-level focal loss normalized per level by positives-per-image.

    Matches `losses/class_loss.py:26-61`: normalizer = sum(mask)/batch, with
    divide-no-nan semantics when a level has no positives.
    """
    total = 0.0
    for targets, outputs, mask in zip(class_targets, class_outputs, masks):
        mask_f = mask.astype(jnp.float32)
        normalizer = jnp.sum(mask_f) / jnp.asarray(mask_f.shape[0], jnp.float32)
        per_elem = focal_loss(
            targets, outputs, 1.0, alpha=alpha, gamma=gamma,
            label_smoothing=label_smoothing,
        )
        total += jnp.where(normalizer == 0, 0.0, jnp.sum(per_elem) /
                           jnp.where(normalizer == 0, 1.0, normalizer))
    return total


def focus_loss(
    y_true: jax.Array, y_pred_logits: jax.Array, threshold: float = 0.5
) -> jax.Array:
    """Balanced MSE for keypoint heatmaps (`losses/focus_loss.py:10-39`).

    Foreground (nonzero-target) and background pixels are normalized
    separately by their counts and inverse frequency.
    """
    b, h, w = y_true.shape[0], y_true.shape[1], y_true.shape[2]
    y_pred = jax.nn.sigmoid(y_pred_logits)
    object_mask = (y_true != 0.0).astype(jnp.float32)
    object_num = jnp.sum(object_mask)
    hw = jnp.asarray(h * w, jnp.float32)
    other_num = hw - object_num
    object_percent = object_num / hw
    sq_obj = jnp.sum(jnp.square((y_true - y_pred) * object_mask))
    sq_other = jnp.sum(jnp.square((y_true - y_pred) * (1.0 - object_mask)))
    loss_object = sq_obj / object_num / object_percent
    loss_other = sq_other / other_num / (1.0 - object_percent)
    return (loss_object + loss_other) / jnp.asarray(b, jnp.float32)


def smooth_l1_loss(y_true: jax.Array, y_pred: jax.Array, beta: float = 0.5) -> jax.Array:
    """β-smooth-L1, elementwise (`utils/smooth_l1_loss.py:10-14`)."""
    a = jnp.abs(y_pred - y_true)
    return jnp.where(a < beta, 0.5 * a**2 / beta, a - 0.5 * beta)


def euclidean_distance_sq(e1: jax.Array, e2: jax.Array, axis=-1) -> jax.Array:
    """Squared euclidean distance (`facenet_model.py:112-122`)."""
    return jnp.sum(jnp.square(e1 - e2), axis=axis)


def triplet_loss(
    anchor: jax.Array,
    positive: jax.Array,
    negative: jax.Array,
    alpha: float,
    valid: jax.Array | None = None,
) -> jax.Array:
    """Margin triplet loss over squared distances, mean over the batch.

    ``valid`` masks padded triplets (static-shape replacement for the
    reference's variable-length triplet batches, `facenet_model.py:177-195`).
    """
    pos_dist = euclidean_distance_sq(anchor, positive, axis=1)
    neg_dist = euclidean_distance_sq(anchor, negative, axis=1)
    basic = jnp.maximum(pos_dist - neg_dist + alpha, 0.0)
    if valid is None:
        return jnp.mean(basic)
    valid_f = valid.astype(basic.dtype)
    return jnp.sum(basic * valid_f) / jnp.maximum(jnp.sum(valid_f), 1.0)


def moco_info_nce_loss(
    y_q: Sequence[jax.Array],
    y_k: Sequence[jax.Array],
    queue: jax.Array,
    temperature: float = 0.07,
) -> jax.Array:
    """MoCo InfoNCE over l2-normalized flattened multi-scale features.

    Matches `momentum_contrast/model.py:316-348`: positives are q·k per
    sample, negatives q·queueᵀ over the K-entry ring buffer; loss is
    ``-log softmax(logits / T)[:, 0]`` averaged over the batch.
    """
    n = y_q[0].shape[0]
    q = jnp.concatenate([y.reshape(n, -1) for y in y_q], axis=-1)
    k = jnp.concatenate([y.reshape(n, -1) for y in y_k], axis=-1)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    k = k / jnp.linalg.norm(k, axis=1, keepdims=True)
    l_pos = jnp.sum(q * k, axis=1, keepdims=True)  # (N, 1)
    l_neg = q @ queue.T  # (N, K)
    logits = jnp.concatenate([l_pos, l_neg], axis=1) / temperature
    return jnp.mean(-jax.nn.log_softmax(logits, axis=1)[:, 0])


def l2_regularization(params, weight_decay: float) -> jax.Array:
    """Weight decay over conv/dense kernels only (biases and BN excluded).

    Mirrors the variable-name regex filter of
    `efficientnet/efficientdet_net_train.py:41-47`; in flax pytrees, the
    corresponding leaves are named ``kernel``.
    """
    leaves_sum = 0.0
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if any(n in ("kernel", "weight", "depthwise_kernel") for n in names):
            leaves_sum += jnp.sum(jnp.square(leaf))
    return weight_decay * leaves_sum
