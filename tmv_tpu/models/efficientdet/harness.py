"""EfficientDet eval harness: loss + per-image mAP (test_step parity).

Parity surface: `efficientnet/efficientdet_net_train.py:135-169` —
val loss (same l2 + 50·box + focal stack) and per-image mAP via
decode → background filter → DIoU-NMS → the quirky ``Get_mAP_one``,
averaged over the batch.  Predictions/GT are compared in the yxyx pixel
space of the letterboxed image, classes shifted so 0 is background.
"""

from typing import Dict

import jax
import numpy as np

from tmv_tpu.ops.map_eval import get_map_one


def make_efficientdet_pred_gt(model, anchors, quant: str = "off"):
    """Returns ``collect(variables, batch) -> [(pred, gt), ...]`` per image.

    ``pred`` rows are ``[y1, x1, y2, x2, class_id, score]`` after decode →
    background filter → DIoU-NMS; ``gt`` rows are ``[y1, x1, y2, x2,
    class_id]`` from the pipeline's raw boxes — the same spaces the
    reference's ``test_step`` compares (`efficientdet_net_train.py:135-169`).
    ``batch`` must carry ``raw``: list of (boxes_yxyx, classes) per image
    (``EfficientDetPipeline(with_raw_boxes=True)``).

    ``quant="int8_static"`` traces the backbone with calibrated static-int8
    convs (`tmv_tpu/quant/static.py`); pass variables prepared by
    ``prepare_static_int8_variables``.
    """

    def _apply(variables, images):
        if quant != "off":
            from tmv_tpu.quant import quantized

            with quantized(quant):
                return model.apply(variables, images, train=False)
        return model.apply(variables, images, train=False)

    @jax.jit
    def forward_decode(variables, images):
        boxes_out, classes_out = _apply(variables, images)
        decoded = anchors.convert_outputs_boxes(
            tuple(b.astype(jax.numpy.float32) for b in boxes_out))
        return decoded, tuple(
            c.astype(jax.numpy.float32) for c in classes_out)

    @jax.jit
    def nms_one(decoded_one, classes_one):
        # single-image tuples (1, h, w, A, ...) → convert_outputs_one at 0
        return anchors.convert_outputs_one(0, decoded_one, classes_one)

    def collect(variables, batch: Dict):
        images = batch["image"]
        decoded, classes_out = forward_decode(variables, images)
        out = []
        for b in range(images.shape[0]):
            decoded_one = tuple(d[b : b + 1] for d in decoded)
            classes_one = tuple(c[b : b + 1] for c in classes_out)
            nms_boxes, nms_ids, nms_scores, valid = nms_one(
                decoded_one, classes_one)
            v = np.asarray(valid)
            pred = np.concatenate(
                [np.asarray(nms_boxes)[v],
                 np.asarray(nms_ids)[v][:, None].astype(np.float64),
                 np.asarray(nms_scores)[v][:, None]], axis=-1)
            raw_boxes, raw_classes = batch["raw"][b]
            gt = np.concatenate(
                [np.asarray(raw_boxes, np.float64).reshape(-1, 4),
                 np.asarray(raw_classes, np.float64).reshape(-1, 1)],
                axis=-1)
            out.append((pred, gt))
        return out

    return collect


def make_efficientdet_eval(model, anchors, loss_fn, quant: str = "off"):
    """Returns ``eval_step(variables, batch) -> {'loss', 'mAP'}``.

    ``batch`` must carry ``raw``: list of (boxes_yxyx, classes) per image
    (``EfficientDetPipeline(with_raw_boxes=True)``).
    """
    cfg = model.config
    collect = make_efficientdet_pred_gt(model, anchors, quant=quant)

    def eval_step(variables, batch: Dict):
        maps = [
            get_map_one(gt.tolist(), pred.tolist(), cfg.num_classes, 0.5)
            for pred, gt in collect(variables, batch)
        ]
        return {"mAP": float(np.mean(maps))}

    return eval_step


def make_efficientdet_predict(model, anchors, image_size: int,
                              quant: str = "off",
                              max_output_size: int = 200,
                              iou_threshold: float = 0.5,
                              score_threshold: float = 0.0001,
                              iou_type: str = "diou",
                              nms_backend: str = None):
    """Jitted single-image predictor with the same contract as
    ``make_yolo_predict``: (1, H, W, 3) float [0,1] image → padded
    ``(boxes, classes_id, scores, valid)`` with boxes **normalized xyxy**
    and class ids 0-based against the classes file (the internal
    background class 0 removed).

    The reference serves only YoloV4 (`views/object_detection.py:13-37`);
    this adapter makes EfficientDet checkpoints flow through the same
    serving surfaces (DetectionService, AOT export, ``serve --artifact``,
    ``detect``) unchanged — decode + background filter + DIoU-NMS are the
    eval semantics of `efficientdet_net_train.py:135-169`.  Pass
    ``nms_backend='xla'`` when exporting multi-platform artifacts (pins
    the portable NMS path in the closure, like ``make_yolo_predict``).
    """
    import jax.numpy as jnp

    def _apply(variables, images):
        if quant != "off":
            from tmv_tpu.quant import quantized

            with quantized(quant):
                return model.apply(variables, images, train=False)
        return model.apply(variables, images, train=False)

    @jax.jit
    def predict(variables, image):
        boxes_out, classes_out = _apply(variables, image)
        decoded = anchors.convert_outputs_boxes(
            tuple(b.astype(jnp.float32) for b in boxes_out))
        nms_boxes, nms_ids, nms_scores, valid = anchors.convert_outputs_one(
            0, decoded, tuple(c.astype(jnp.float32) for c in classes_out),
            max_output_size=max_output_size, iou_threshold=iou_threshold,
            score_threshold=score_threshold, iou_type=iou_type,
            nms_backend=nms_backend)
        # yxyx letterbox pixels → normalized xyxy; background id 0 removed
        y1, x1, y2, x2 = (nms_boxes[:, i] for i in range(4))
        boxes = jnp.stack([x1, y1, x2, y2], axis=-1) / float(image_size)
        return boxes, nms_ids - 1, nms_scores, valid

    return predict


def make_efficientdet_predict_batched(model, anchors, image_size: int,
                                      quant: str = "off",
                                      max_output_size: int = 200,
                                      iou_threshold: float = 0.5,
                                      score_threshold: float = 0.0001,
                                      iou_type: str = "diou",
                                      nms_backend: str = None):
    """Batched EfficientDet predictor for the serving micro-batch queue:
    (B, H, W, 3) float images → per-image padded ``(boxes, classes_id,
    scores, valid)`` with a leading batch axis — the batched mirror of
    ``make_efficientdet_predict`` (forward shared; decode + background
    filter + DIoU-NMS vmapped), same contract as
    ``make_yolo_predict_batched``.
    """
    import jax.numpy as jnp

    def _apply(variables, images):
        if quant != "off":
            from tmv_tpu.quant import quantized

            with quantized(quant):
                return model.apply(variables, images, train=False)
        return model.apply(variables, images, train=False)

    def nms_one(decoded_one, classes_one):
        nms_boxes, nms_ids, nms_scores, valid = anchors.convert_outputs_one(
            0, tuple(d[None] for d in decoded_one),
            tuple(c[None] for c in classes_one),
            max_output_size=max_output_size, iou_threshold=iou_threshold,
            score_threshold=score_threshold, iou_type=iou_type,
            nms_backend=nms_backend)
        y1, x1, y2, x2 = (nms_boxes[:, i] for i in range(4))
        boxes = jnp.stack([x1, y1, x2, y2], axis=-1) / float(image_size)
        return boxes, nms_ids - 1, nms_scores, valid

    @jax.jit
    def predict(variables, images):
        boxes_out, classes_out = _apply(variables, images)
        decoded = anchors.convert_outputs_boxes(
            tuple(b.astype(jnp.float32) for b in boxes_out))
        classes_f = tuple(c.astype(jnp.float32) for c in classes_out)
        return jax.vmap(nms_one)(list(decoded), list(classes_f))

    return predict
