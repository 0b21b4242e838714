"""Export a warm detector predictor to a StableHLO serving artifact.

The reference deploys by importing the training codebase into every uWSGI
worker and rebuilding the model (`views/object_detection.py:13-37`).  This
CLI bakes the whole predict path (forward + decode + class-aware NMS) into
one `.tmvx` artifact instead; `cli/serve.py --artifact` serves it without
touching the model zoo.

Usage:
    python -m tmv_tpu.cli.export_model --modelPath ./data/yolo_weights \
        --classesFile ./data/classes.txt --anchorsFile ./data/anchors.txt \
        --out model.tmvx
"""

import argparse


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--modelPath", default=None,
                   help="checkpoint dir (omit for random init, e.g. smoke "
                        "tests)")
    p.add_argument("--family", default="yolo",
                   choices=["yolo", "efficientdet"])
    p.add_argument("--modelName", default="efficientdet-d0",
                   help="efficientdet config name (family=efficientdet)")
    p.add_argument("--classesFile", required=True)
    p.add_argument("--anchorsFile", default=None,
                   help="anchors csv (required for family=yolo; the "
                        "efficientdet family generates anchors from its "
                        "config)")
    p.add_argument("--version", default="v4",
                   choices=["v3", "v4", "resnet"],
                   help="'resnet' = the MoCo/distill ResNet50V2+YOLOv3-head "
                        "detector")
    p.add_argument("--imageSize", type=int, default=416)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--out", required=True)
    p.add_argument("--platforms", default="tpu,cpu",
                   help="comma-separated lowering targets")
    p.add_argument("--confidenceThresh", type=float, default=0.5)
    p.add_argument("--scoresThresh", type=float, default=0.2)
    p.add_argument("--iouThresh", type=float, default=0.5)
    p.add_argument("--int8Static", metavar="CALIB_DIR", default=None,
                   help="bake the static-calibration int8 serving path "
                        "into the artifact: calibrate activation scales "
                        "over the images in CALIB_DIR, pre-quantize "
                        "weights, export the int8 program (int8 is "
                        "portable StableHLO — runs on every --platforms "
                        "target)")
    p.add_argument("--int8Margin", type=float, default=1.0,
                   help="multiplier on the calibrated activation absmax "
                        "(<1 clips outliers; see eval_map --int8Margin)")
    p.add_argument("--int8PerChannel", action="store_true",
                   help="per-input-channel activation scales (see "
                        "eval_map --int8PerChannel)")
    args = p.parse_args()
    if args.family == "yolo" and not args.anchorsFile:
        p.error("--anchorsFile is required for --family yolo")
    return args


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tmv_tpu.data.loaders import load_anchors, load_classes
    from tmv_tpu.models.detector_harness import (
        build_yolo_model, make_yolo_predict,
    )
    from tmv_tpu.serving.export import export_predictor

    args = parse_args()
    classes_name, classes_num = load_classes(args.classesFile)
    image_wh = (args.imageSize, args.imageSize)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    if args.family == "efficientdet":
        _export_efficientdet(args, classes_num, dtype)
        return
    anchors = load_anchors(args.anchorsFile)
    model, iou_type = build_yolo_model(
        args.version, classes_num, anchors_per_scale=anchors.shape[1],
        dtype=dtype)

    x0 = jnp.zeros((1, image_wh[1], image_wh[0], 3), jnp.float32)
    variables = model.init(jax.random.key(0), x0, train=False)
    if args.modelPath:
        import optax

        from tmv_tpu.core.checkpoint import CheckpointManager
        from tmv_tpu.core.train_state import TrainState

        state = TrainState.create(
            variables["params"], variables["batch_stats"], optax.sgd(1e-3))
        state = CheckpointManager(args.modelPath).restore_weights(state)
        print(f"checkpoint at step {int(state.step)}")
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}

    quant = "off"
    if args.int8Static:
        from tmv_tpu.quant.static import calibrate_directory

        print(f"calibrating int8 scales from {args.int8Static}...")
        variables = calibrate_directory(model, variables, args.int8Static,
                                        image_wh, margin=args.int8Margin,
                                        per_channel=args.int8PerChannel)
        quant = "int8_static"

    # nms_backend='xla' is part of the closure: the exported program must
    # be portable across every --platforms target, so the TPU-only Pallas
    # NMS kernel is excluded at trace time (not via the process global).
    predict = make_yolo_predict(
        model, image_wh, anchors, classes_num,
        confidence_thresh=args.confidenceThresh,
        scores_thresh=args.scoresThresh, iou_thresh=args.iouThresh,
        iou_type=iou_type, nms_backend="xla", quant=quant,
    )
    example = np.zeros((1, image_wh[1], image_wh[0], 3), np.float32)
    blob = export_predictor(
        predict, variables, example, path=args.out, bake_variables=True,
        platforms=tuple(args.platforms.split(",")),
        meta={"image_size": args.imageSize, "version": args.version,
              "classes_num": classes_num, "quant": quant},
    )
    print(f"wrote {args.out}: {len(blob)/1e6:.2f} MB "
          f"(classes={classes_num}, {args.version} @{args.imageSize})")


if __name__ == "__main__":
    main()


def _export_efficientdet(args, classes_num, dtype):
    """Bake the EfficientDet predict path (forward + anchor decode +
    DIoU-NMS, `models/efficientdet/harness.py::make_efficientdet_predict`)
    into the same artifact format — ``serve --artifact`` runs it through
    the unchanged DetectionService contract."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tmv_tpu.models.efficientdet import (
        EfficientDetNet, get_efficientdet_config,
    )
    from tmv_tpu.models.efficientdet.harness import (
        make_efficientdet_predict,
    )
    from tmv_tpu.ops.anchors import Anchors
    from tmv_tpu.serving.export import export_predictor

    cfg = get_efficientdet_config(args.modelName)
    cfg.num_classes = classes_num + 1  # background reserved at id 0
    cfg.image_size = args.imageSize
    cfg.levels_size = [args.imageSize]
    for _ in range(cfg.max_level):
        cfg.levels_size.append((cfg.levels_size[-1] + 1) // 2)
    anchors = Anchors(cfg.min_level, cfg.max_level,
                      (cfg.image_size, cfg.image_size), cfg.num_scales,
                      cfg.aspect_ratios, cfg.anchor_scale)
    model = EfficientDetNet(config=cfg, dtype=dtype)
    x0 = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x0, train=False)
    if args.modelPath:
        import optax

        from tmv_tpu.core.checkpoint import CheckpointManager
        from tmv_tpu.core.train_state import TrainState

        state = TrainState.create(
            variables["params"], variables["batch_stats"], optax.sgd(1e-3))
        state = CheckpointManager(args.modelPath).restore_weights(state)
        print(f"checkpoint at step {int(state.step)}")
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
    quant = "off"
    if args.int8Static:
        from tmv_tpu.quant.static import calibrate_directory

        print(f"calibrating int8 scales from {args.int8Static}...")
        variables = calibrate_directory(
            model, variables, args.int8Static,
            (cfg.image_size, cfg.image_size), margin=args.int8Margin,
            per_channel=args.int8PerChannel)
        quant = "int8_static"
    predict = make_efficientdet_predict(
        model, anchors, cfg.image_size, quant=quant,
        iou_threshold=args.iouThresh, score_threshold=args.scoresThresh,
        nms_backend="xla",
    )
    example = np.zeros((1, cfg.image_size, cfg.image_size, 3), np.float32)
    blob = export_predictor(
        predict, variables, example, path=args.out, bake_variables=True,
        platforms=tuple(args.platforms.split(",")),
        meta={"image_size": args.imageSize, "version": args.modelName,
              "classes_num": classes_num, "quant": quant,
              "family": "efficientdet"},
    )
    print(f"wrote {args.out}: {len(blob)/1e6:.2f} MB "
          f"(classes={classes_num}, {args.modelName} @{args.imageSize})")
