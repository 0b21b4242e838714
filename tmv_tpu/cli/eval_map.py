"""Dataset mAP evaluation CLI for trained detectors.

The reference computes val_mAP only *inside* `model.fit` — per-batch mAP
via ``tf.numpy_function`` averaged by Keras (`yolo_v3/model.py:229-258`,
`efficientdet_net_train.py:135-169`); there is no standalone "evaluate a
checkpoint on a labeled set" entry point.  This CLI adds one for both
detector families:

- ``--mode batch`` (default) reproduces the reference semantics exactly:
  per-image mAP, averaged over the set (``--variant`` selects the
  per-image AP integrator; ``coco`` averages per-image COCO AP).
- ``--mode global`` accumulates all images into one PR curve per class —
  the statistically standard evaluation — with ``--variant
  reference|voc|coco`` selecting the AP integrator
  (`ops/map_eval.py::get_ap{,_voc,_coco}`).

Both modes and all three variants are implemented for both families; the
JSON output reports the mode/variant that actually ran.

Usage:
    python -m tmv_tpu.cli.eval_map --family yolo --version v4 \
        --imagePath imgs/ --labelFile labels.txt --classesFile classes.txt \
        --anchorsFile anchors.txt --modelPath ./weights --imageSize 416
"""

import argparse
import json

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--family", default="yolo",
                   choices=["yolo", "efficientdet"])
    p.add_argument("--version", default="v4",
                   choices=["v3", "v4", "resnet"],
                   help="yolo family version ('resnet' = the MoCo/distill "
                        "ResNet50V2+YOLOv3-head detector)")
    p.add_argument("--modelName", default="efficientdet-d0")
    p.add_argument("--imagePath", required=True)
    p.add_argument("--labelFile", required=True)
    p.add_argument("--classesFile", required=True)
    p.add_argument("--anchorsFile", default=None,
                   help="required for --family yolo")
    p.add_argument("--modelPath", default=None,
                   help="checkpoint dir (omit = random init, smoke only)")
    p.add_argument("--imageSize", type=int, default=416)
    p.add_argument("--maxImages", type=int, default=0,
                   help="cap evaluated images (0 = whole set once)")
    p.add_argument("--batchSize", type=int, default=1,
                   help="evaluate this many images per device call "
                        "(throughput; per-image results are identical)")
    p.add_argument("--mode", default="batch", choices=["batch", "global"])
    p.add_argument("--variant", default="reference",
                   choices=["reference", "voc", "coco"])
    p.add_argument("--thresh", type=float, default=0.5,
                   help="IoU match threshold (non-coco variants)")
    p.add_argument("--confidenceThresh", type=float, default=0.5)
    p.add_argument("--scoresThresh", type=float, default=0.2)
    p.add_argument("--iouThresh", type=float, default=0.5)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--cacheDir", default=None,
                   help="epoch-persistent staging cache (yolo family "
                        "only; `data/stage_cache.py`) — speeds up "
                        "repeated evaluations of the same dataset")
    p.add_argument("--int8Static", action="store_true",
                   help="evaluate the static-calibration int8 serving "
                        "path: calibrate activation scales on the first "
                        "16 eval images, then score the int8 predictor — "
                        "measures the quantization mAP delta (yolo: whole "
                        "net; efficientdet: backbone convs)")
    p.add_argument("--int8Margin", type=float, default=1.0,
                   help="multiplier on the calibrated per-site activation "
                        "absmax (<1 clips outlier activations — converged "
                        "Mish nets can grow absmax far past the bulk of "
                        "the distribution, sinking per-tensor int8; see "
                        "tools/probe_int8_v4_drop.py)")
    p.add_argument("--int8PerChannel", action="store_true",
                   help="per-input-channel activation scales (folded "
                        "into the pre-quantized weights — same runtime "
                        "cost, finer resolution; robust to channel-skewed "
                        "activations)")
    args = p.parse_args()
    if args.cacheDir and args.family != "yolo":
        p.error("--cacheDir is yolo-family only (the efficientdet eval "
                "path stages through the host-aug loader)")
    return args


def _restore_variables(args, model, x0):
    import jax
    import optax

    from tmv_tpu.core.train_state import TrainState

    variables = model.init(jax.random.key(0), x0, train=False)
    if args.modelPath:
        from tmv_tpu.core.checkpoint import CheckpointManager

        state = TrainState.create(
            variables["params"], variables["batch_stats"], optax.sgd(1e-3))
        state = CheckpointManager(args.modelPath).restore_weights(state)
        print(f"checkpoint at step {int(state.step)}")
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
    return variables


def score_dataset(data, classes_num: int, mode: str, variant: str,
                  thresh: float) -> float:
    """Score collected per-image rows under every mode × variant.

    ``data``: list of ``{"image_path", "groud_truth", "prediction"}`` dicts
    (the reference's evaluator record format, `utils/mAP.py:113-131`).
    ``mode='batch'`` averages per-image mAP (the reference ``test_step``
    semantics, `yolo_v3/model.py:229-258`); ``mode='global'`` pools all
    images into one PR curve per class.  ``variant`` picks the AP
    integrator: 'reference' (quirky envelope), 'voc' (corrected 11-free
    envelope), 'coco' (AP@[.50:.95], ignores ``thresh``).
    """
    from tmv_tpu.ops.map_eval import get_map, get_map_coco

    def one(subset):
        if variant == "coco":
            return get_map_coco(subset, classes_num)
        return get_map(subset, classes_num, thresh, variant=variant)

    if mode == "global":
        return float(one(data))
    per_image = [one([d]) for d in data]
    return float(np.mean(per_image)) if per_image else 0.0


def eval_yolo(args):
    import jax.numpy as jnp

    from tmv_tpu.data.loaders import load_anchors
    from tmv_tpu.data.yolo_pipeline import YoloDataPipeline
    from tmv_tpu.models.detector_harness import (
        build_yolo_model,
        ground_truth_from_targets,
        make_yolo_predict,
    )

    anchors = load_anchors(args.anchorsFile)
    image_wh = (args.imageSize, args.imageSize)
    pipeline = YoloDataPipeline(
        args.imagePath, args.labelFile, args.classesFile,
        batch_size=args.batchSize,
        anchors=anchors, image_wh=image_wh, image_random=False,
        label_mean=False, prefetch=2, cache_dir=args.cacheDir,
    )
    classes_num = pipeline.classes_num
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model, iou_type = build_yolo_model(
        args.version, classes_num, anchors_per_scale=anchors.shape[1],
        dtype=dtype)
    x0 = jnp.zeros((1, image_wh[1], image_wh[0], 3), jnp.float32)
    variables = _restore_variables(args, model, x0)
    quant = "off"
    if args.int8Static:
        from tmv_tpu.quant import (
            calibrate_model, prepare_static_int8_variables,
        )

        n_calib = max(1, (16 + args.batchSize - 1) // args.batchSize)
        calib = [b["image"] for _, b in zip(range(n_calib), pipeline)]
        print(f"calibrating int8 scales on "
              f"{sum(len(c) for c in calib)} images...")
        variables = prepare_static_int8_variables(
            variables, calibrate_model(model, variables, calib,
                                       train=False),
            margin=args.int8Margin, per_channel=args.int8PerChannel)
        quant = "int8_static"
    kwargs = dict(
        confidence_thresh=args.confidenceThresh,
        scores_thresh=args.scoresThresh, iou_thresh=args.iouThresh,
        iou_type=iou_type, quant=quant,
    )
    if args.batchSize > 1:
        from tmv_tpu.models.detector_harness import (
            make_yolo_predict_batched,
        )

        predict_b = make_yolo_predict_batched(
            model, image_wh, anchors, classes_num, **kwargs)
    else:
        predict_1 = make_yolo_predict(
            model, image_wh, anchors, classes_num, **kwargs)

        def predict_b(variables, images):
            b, i, s, v = predict_1(variables, images)
            return b[None], i[None], s[None], v[None]

    n = args.maxImages or pipeline.labels_num
    data = []
    n_batches = (n + args.batchSize - 1) // args.batchSize
    for bi, batch in zip(range(n_batches), pipeline):
        boxes_b, ids_b, scores_b, valid_b = predict_b(
            variables, batch["image"])
        for j in range(min(args.batchSize, n - bi * args.batchSize)):
            v = np.asarray(valid_b[j])
            pred = np.concatenate(
                [np.asarray(boxes_b[j])[v],
                 np.asarray(ids_b[j])[v][:, None].astype(np.float64),
                 np.asarray(scores_b[j])[v][:, None]], axis=-1)
            gt = ground_truth_from_targets(
                [np.asarray(t[j]) for t in batch["targets"]], classes_num)
            data.append({"image_path": f"{bi * args.batchSize + j}.jpg",
                         "groud_truth": gt.tolist(),
                         "prediction": pred.tolist()})

    return {"mAP": score_dataset(data, classes_num, args.mode, args.variant,
                                 args.thresh),
            "images": len(data)}


def eval_efficientdet(args):
    import jax.numpy as jnp

    from tmv_tpu.data.efficientdet_pipeline import EfficientDetPipeline
    from tmv_tpu.models.efficientdet import (
        EfficientDetNet, get_efficientdet_config,
    )
    from tmv_tpu.models.efficientdet.harness import make_efficientdet_pred_gt
    from tmv_tpu.ops.anchors import Anchors

    cfg = get_efficientdet_config(args.modelName)
    if args.imageSize:
        cfg.image_size = args.imageSize
        cfg.levels_size = [args.imageSize]
        for _ in range(cfg.max_level):
            cfg.levels_size.append((cfg.levels_size[-1] + 1) // 2)
    # head size follows the dataset (matches train_efficientdet):
    # N real classes + background id 0
    from tmv_tpu.data.loaders import load_classes

    _, _classes_num = load_classes(args.classesFile)
    cfg.num_classes = _classes_num + 1
    anchors = Anchors(
        min_level=cfg.min_level, max_level=cfg.max_level,
        image_size=(cfg.image_size, cfg.image_size),
        num_scales=cfg.num_scales, aspect_ratios=cfg.aspect_ratios,
        anchor_scale=cfg.anchor_scale,
    )
    pipeline = EfficientDetPipeline(
        args.imagePath, args.labelFile, args.classesFile,
        batch_size=args.batchSize,
        anchors=anchors, num_classes=cfg.num_classes,
        image_size=cfg.image_size, augment=False, label_mean=False,
        with_raw_boxes=True,
    )
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model = EfficientDetNet(config=cfg, dtype=dtype)
    x0 = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    variables = _restore_variables(args, model, x0)
    quant = "off"
    if args.int8Static:
        from tmv_tpu.quant import (
            calibrate_model, prepare_static_int8_variables,
        )

        n_calib = max(1, (16 + args.batchSize - 1) // args.batchSize)
        calib = [b["image"] for _, b in zip(range(n_calib), pipeline)]
        print(f"calibrating int8 scales on "
              f"{sum(len(c) for c in calib)} images...")
        variables = prepare_static_int8_variables(
            variables, calibrate_model(model, variables, calib,
                                       train=False),
            margin=args.int8Margin, per_channel=args.int8PerChannel)
        quant = "int8_static"
    collect = make_efficientdet_pred_gt(model, anchors, quant=quant)

    n = args.maxImages or pipeline.labels_num
    data = []
    n_batches = (n + args.batchSize - 1) // args.batchSize
    for bi, batch in zip(range(n_batches), pipeline):
        for j, (pred, gt) in enumerate(collect(variables, batch)):
            if bi * args.batchSize + j >= n:
                break
            data.append({"image_path": f"{bi * args.batchSize + j}.jpg",
                         "groud_truth": gt.tolist(),
                         "prediction": pred.tolist()})
    return {"mAP": score_dataset(data, cfg.num_classes, args.mode,
                                 args.variant, args.thresh),
            "images": len(data)}


def main():
    args = parse_args()
    if args.family == "yolo":
        result = eval_yolo(args)
    else:
        result = eval_efficientdet(args)
    result.update({"family": args.family, "mode": args.mode,
                   "variant": args.variant,
                   "quant": "int8_static" if args.int8Static else "off"})
    if args.int8Static and args.int8Margin != 1.0:
        result["int8_margin"] = args.int8Margin
    print(json.dumps(result))


if __name__ == "__main__":
    main()
