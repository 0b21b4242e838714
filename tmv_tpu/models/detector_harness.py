"""YOLO-family training/prediction harness.

Glues a forward network (``YoloV3``/``YoloV4``) to the shared ops: the
multi-scale loss with shadow-loss EMA, the NMS predict path, and the
layer-freezing warm-start.

Parity surface:
- ``YoloV3Model.train_step`` / ``YoloV4Model.train_step``
  (`yolo_v3/model.py:188-227`, `yolo_v4/model.py:309-347`): loss EMA decay
  0.9 with ``(1+t)/(1000+t)`` warmup — provided by
  ``core.train_state.make_train_step(shadow_loss=True)``.
- ``Predict`` (`yolo_v3/model.py:258-305`, `yolo_v4/model.py:398-427`):
  forward + ``GetNMSBoxes``; v3 uses iou-NMS, v4 uses DIoU-NMS and CIoU
  train loss (`yolo_v4/model.py:294-298`).
- ``FreeLayer`` freeze-by-name-prefix (`yolo_v3/model.py:280-291`):
  realized as an optax mask over param-path prefixes.
- ``GetGroudTruth`` + per-batch mAP test step (`yolo_v3/model.py:229-279`).
"""

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tmv_tpu.ops import yolo as yolo_ops
from tmv_tpu.ops.map_eval import get_map_one


def build_yolo_model(version: str, classes_num: int,
                     anchors_per_scale: int = 3, dtype=jnp.float32):
    """Detector factory for the YOLO-head family → ``(model, iou_type)``.

    ``version``: 'v3' (Darknet-53), 'v4' (CSPDarknet-53 + DIoU-NMS/CIoU),
    or 'resnet' — the MoCo/distill family detector (ResNet50V2 backbone +
    YOLOv3 heads, `momentum_contrast/model.py:39-99`,
    `unsupervised_learning/model.py:39-99`), which shares the v3
    decode/NMS path so finetuned/distilled checkpoints are servable and
    evaluable through the same CLI surface as the reference's
    `momentum_contrast/test_object_detection.py`.
    """
    if version == "v4":
        from tmv_tpu.models.yolo_v4 import YoloV4

        return YoloV4(classes_num=classes_num, dtype=dtype), "diou"
    if version == "v3":
        from tmv_tpu.models.yolo_v3 import YoloV3

        return YoloV3(classes_num=classes_num, dtype=dtype), "iou"
    if version == "resnet":
        from tmv_tpu.models.moco import ResNetYoloV3

        model = ResNetYoloV3(
            out_filters=anchors_per_scale * (5 + classes_num), dtype=dtype)
        return model, "iou"
    raise ValueError(f"unknown yolo-family version {version!r}")


def make_yolo_loss_fn(model, image_wh: Tuple[int, int], anchors_wh,
                      iou_thresh: float = 0.5, iou_type: str = "iou"):
    """Loss for ``make_train_step``: v3 → iou_type='iou', v4 → 'ciou'."""

    anchors = jnp.asarray(anchors_wh, jnp.float32)

    def loss_fn(params, batch_stats, batch, rng):
        images, y_true = batch["image"], batch["targets"]
        y_pred, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images, train=True, mutable=["batch_stats"],
        )
        loss = yolo_ops.yolo_loss(
            y_true, y_pred, image_wh, anchors,
            iou_thresh=iou_thresh, iou_type=iou_type,
        )
        return loss, (mutated["batch_stats"], {})

    return loss_fn


def make_yolo_predict(model, image_wh, anchors_wh, classes_num: int,
                      confidence_thresh: float = 0.5,
                      scores_thresh: float = 0.3,
                      iou_thresh: float = 0.5,
                      iou_type: str = "iou",
                      max_output_size: int = 500,
                      quant: str = "off",
                      nms_backend: str = None):
    """Jitted single-image predictor: (1, H, W, 3) float image → padded
    (boxes, classes_id, scores, valid).  Boxes are normalized xyxy.

    ``quant="int8"`` traces the forward with dynamic-int8 convs
    (`tmv_tpu.quant`) — ~2× MXU rate on v5e, small accuracy drift.
    ``nms_backend`` ('auto'/'xla'/'pallas') pins the NMS lowering as part
    of the closure — pass 'xla' for multi-platform export so the traced
    program never contains the TPU-only Pallas kernel."""

    anchors = jnp.asarray(anchors_wh, jnp.float32)

    def _forward(variables, image):
        if quant != "off":
            from tmv_tpu.quant import quantized

            with quantized(quant):
                return model.apply(variables, image, train=False)
        return model.apply(variables, image, train=False)

    @jax.jit
    def predict(variables, image):
        heads = _forward(variables, image)
        heads_one = [h[0] for h in heads]
        boxes, ids, scores, _classes, _conf, valid = yolo_ops.nms_boxes(
            heads_one, anchors, image_wh, classes_num,
            confidence_thresh=confidence_thresh,
            scores_thresh=scores_thresh,
            iou_thresh=iou_thresh,
            iou_type=iou_type,
            max_output_size=max_output_size,
            nms_backend=nms_backend,
        )
        return boxes, ids, scores, valid

    return predict


def make_yolo_predict_batched(model, image_wh, anchors_wh, classes_num: int,
                              confidence_thresh: float = 0.5,
                              scores_thresh: float = 0.3,
                              iou_thresh: float = 0.5,
                              iou_type: str = "iou",
                              max_output_size: int = 500,
                              quant: str = "off",
                              nms_backend: str = None):
    """Batched predictor for the serving micro-batch queue: (B, H, W, 3)
    float images → per-image padded (boxes, classes_id, scores, valid) with
    a leading batch axis.  Same semantics as ``make_yolo_predict`` per
    image (the forward is shared; decode+NMS is vmapped).  ``quant``
    mirrors ``make_yolo_predict`` (pass variables prepared by
    ``prepare_static_int8_variables`` for ``"int8_static"``)."""

    anchors = jnp.asarray(anchors_wh, jnp.float32)

    def nms_one(heads_one):
        boxes, ids, scores, _classes, _conf, valid = yolo_ops.nms_boxes(
            heads_one, anchors, image_wh, classes_num,
            confidence_thresh=confidence_thresh,
            scores_thresh=scores_thresh,
            iou_thresh=iou_thresh,
            iou_type=iou_type,
            max_output_size=max_output_size,
            nms_backend=nms_backend,
        )
        return boxes, ids, scores, valid

    def _forward(variables, images):
        if quant != "off":
            from tmv_tpu.quant import quantized

            with quantized(quant):
                return model.apply(variables, images, train=False)
        return model.apply(variables, images, train=False)

    @jax.jit
    def predict(variables, images):
        heads = _forward(variables, images)
        return jax.vmap(nms_one)(list(heads))

    return predict


def ground_truth_from_targets(y_true, classes_num: int):
    """Extract `[x1, y1, x2, y2, class_id]` rows from grid targets.

    Host-side helper matching ``GetGroudTruth`` (`yolo_v3/model.py:260-279`).
    Input: single-image per-scale targets (h, w, A, 5+C) numpy arrays.
    """
    rows = []
    for t in y_true:
        t = np.asarray(t)
        obj = t[..., 4] > 0
        if not obj.any():
            continue
        sel = t[obj]
        xy = sel[:, 0:2]
        wh = sel[:, 2:4]
        cid = sel[:, 5 : 5 + classes_num].argmax(-1)
        mins = xy - wh / 2
        maxs = xy + wh / 2
        rows.append(np.concatenate([mins, maxs, cid[:, None]], axis=-1))
    if not rows:
        return np.zeros((0, 5))
    return np.concatenate(rows, axis=0)


def eval_map_step(predict_fn, variables, batch, classes_num: int,
                  thresh: float = 0.5) -> float:
    """Per-batch mAP like the reference ``test_step``
    (`yolo_v3/model.py:229-258`): predict, assemble prediction rows, compare
    with GT via the quirky evaluator, batch size 1 semantics."""
    image = batch["image"]
    y_true = [np.asarray(t[0]) for t in batch["targets"]]
    boxes, ids, scores, valid = predict_fn(variables, image)
    v = np.asarray(valid)
    pred = np.concatenate(
        [np.asarray(boxes)[v], np.asarray(ids)[v][:, None].astype(np.float64),
         np.asarray(scores)[v][:, None]], axis=-1,
    )
    gt = ground_truth_from_targets(y_true, classes_num)
    return get_map_one(gt.tolist(), pred.tolist(), classes_num, thresh)


def freeze_mask(params, trainable_prefixes: Sequence[str]):
    """Bool pytree: True = trainable.  ``FreeLayer`` parity
    (`yolo_v3/model.py:280-291`) — freeze everything whose top-level module
    path does not start with one of ``trainable_prefixes``."""

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(path):
        return "/".join(getattr(p, "key", str(p)) for p in path)

    leaves = {}
    for path, leaf in flat:
        leaves[path_str(path)] = any(
            path_str(path).startswith(p) for p in trainable_prefixes
        )

    def build(tree, prefix=""):
        if isinstance(tree, dict):
            return {
                k: build(v, f"{prefix}/{k}" if prefix else k)
                for k, v in tree.items()
            }
        return leaves[prefix]

    return build(params)


def masked_optimizer(tx: optax.GradientTransformation, mask):
    """Zero updates for frozen params (warm-start phase,
    `yolo_v3/train.py:79-87`)."""
    return optax.chain(
        optax.masked(tx, mask),
        optax.masked(optax.set_to_zero(),
                     jax.tree.map(lambda m: not m, mask)),
    )
