"""Serving CLI: warm YOLOv4 predictor behind the reference HTTP contract.

Parity surface: the Django entry (`AIServer/manage.py` + `uwsgi.ini`) and
the model-at-import-time warm start of `views/object_detection.py:17-37`.

Usage:
    python -m tmv_tpu.cli.serve --modelPath ./data/yolo_weights \
        --classesFile ./data/classes.txt --anchorsFile ./data/anchors.txt
"""

import argparse


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--modelPath", default="./data/yolo_weights")
    p.add_argument("--classesFile", required=True)
    p.add_argument("--anchorsFile", default=None,
                   help="required unless serving an --artifact (the "
                        "artifact bakes decode+NMS in)")
    p.add_argument("--version", default="v4",
                   choices=["v3", "v4", "resnet"],
                   help="'resnet' = the MoCo/distill ResNet50V2+YOLOv3-head "
                        "detector")
    p.add_argument("--family", default="yolo",
                   choices=["yolo", "efficientdet"],
                   help="efficientdet serves the D-config named by "
                        "--modelName through the same HTTP contract "
                        "(single-image or --batch N micro-batching; "
                        "no int8/dp/spatial)")
    p.add_argument("--modelName", default="efficientdet-d0",
                   help="efficientdet config name (family=efficientdet)")
    p.add_argument("--imageSize", type=int, default=416)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--batch", type=int, default=1,
                   help="micro-batch capacity (>1 enables the batching "
                        "queue + threaded server)")
    p.add_argument("--batchWaitMs", type=float, default=4.0)
    p.add_argument("--dp", type=int, default=0,
                   help="shard the micro-batch over this many devices "
                        "(data-parallel serving, requires --batch divisible "
                        "by it; 0 = single device)")
    p.add_argument("--spatial", type=int, default=0,
                   help="shard each image's HEIGHT over this many devices "
                        "(latency-direction scaling for big resolutions; "
                        "--batch 1 only, imageSize divisible by it; "
                        "0 = off)")
    p.add_argument("--int8", action="store_true",
                   help="experimental dynamic-int8 conv path; on v5e the "
                        "bandwidth-bound YOLO models run ~0.8x bf16 "
                        "(see PARITY §6) — use --int8Static instead")
    p.add_argument("--int8Static", metavar="CALIB_DIR",
                   help="static-calibration int8: calibrate activation "
                        "scales over the images in CALIB_DIR, pre-quantize "
                        "weights, serve the int8 predictor (measured "
                        "1.46x bf16 on YOLOv4 @640, PARITY §6)")
    p.add_argument("--int8Margin", type=float, default=1.0,
                   help="multiplier on the calibrated activation absmax "
                        "(<1 clips outliers; see eval_map --int8Margin)")
    p.add_argument("--int8PerChannel", action="store_true",
                   help="per-input-channel activation scales (see "
                        "eval_map --int8PerChannel)")
    p.add_argument("--artifact", default=None,
                   help="serve a .tmvx export (cli/export_model.py) — "
                        "skips model build + checkpoint load")
    args = p.parse_args()
    # reject silently-ignored flag combinations up front
    if args.artifact:
        bad = [f for f, on in [("--batch", args.batch > 1),
                               ("--int8", args.int8),
                               ("--int8Static", bool(args.int8Static)),
                               ("--dp", args.dp > 0),
                               ("--bf16", args.bf16)] if on]
        if bad:
            p.error(f"{', '.join(bad)} cannot be combined with --artifact: "
                    "the exported program pins its own batch size and "
                    "dtypes at export time")
    elif args.family == "efficientdet":
        bad = [f for f, on in [("--int8", args.int8),
                               ("--int8Static", bool(args.int8Static))]
               if on]
        if bad:
            p.error(f"{', '.join(bad)} are not supported with --family "
                    "efficientdet (int8 serving is yolo-family; see "
                    "PARITY §6 — D0 measured 0.73x)")
        if args.dp:
            if args.batch <= 1 or args.batch % args.dp:
                p.error("--dp requires --batch > 1 divisible by it")
        if args.spatial:
            if args.batch > 1 or args.dp:
                p.error("--spatial is the latency direction: --batch 1, "
                        "no --dp")
            if args.imageSize % args.spatial:
                p.error(f"--imageSize {args.imageSize} is not divisible "
                        f"by --spatial {args.spatial}")
    else:
        if args.anchorsFile is None:
            p.error("--anchorsFile is required (omit only with --artifact)")
        if args.int8 and args.int8Static:
            p.error("--int8 and --int8Static are mutually exclusive")
        if args.int8Static and args.version == "v4" \
                and not args.int8PerChannel:
            # measured on the converged 256-image artifact
            # (converged_map_v4.json): per-tensor static int8 collapses
            # v4 mAP 0.904 -> 0.547 (v3's delta on the same recipe:
            # -0.002) — outlier Mish activations in the PAN layers
            # dominate the per-tensor absmax (int8_v4_probe.json)
            print("WARNING: --int8Static with per-TENSOR scales loses "
                  "~0.36 mAP on YOLOv4 (0.904 -> 0.547 measured, "
                  "converged_map_v4.json). Add --int8PerChannel, or use "
                  "bf16 for v4.", flush=True)
        if args.int8 and args.batch > 1:
            p.error("--int8 (dynamic) is only supported with --batch 1; "
                    "use --int8Static for batched throughput serving")
        if args.dp:
            if args.batch <= 1:
                p.error("--dp requires --batch > 1 (the sharded predictor "
                        "serves the micro-batch queue)")
            if args.batch % args.dp:
                p.error(f"--batch {args.batch} is not divisible by "
                        f"--dp {args.dp}")
        if args.spatial:
            if args.batch > 1 or args.dp:
                p.error("--spatial is the latency direction: --batch 1, "
                        "no --dp (combine via a 2-D mesh is future work)")
            if args.imageSize % args.spatial:
                p.error(f"--imageSize {args.imageSize} is not divisible "
                        f"by --spatial {args.spatial}")
    return args


def serve_artifact(args):
    import jax.numpy as jnp

    from tmv_tpu.data.loaders import load_classes
    from tmv_tpu.serving.app import DetectionService, run_server
    from tmv_tpu.serving.export import load_predictor, read_export_meta

    classes_name, _ = load_classes(args.classesFile)
    meta = read_export_meta(args.artifact)
    if meta.get("image_size") and meta["image_size"] != args.imageSize:
        raise SystemExit(
            f"--imageSize {args.imageSize} does not match the artifact "
            f"(exported at {meta['image_size']} px, shape "
            f"{meta.get('input_shape')}); pass "
            f"--imageSize {meta['image_size']}")
    image_wh = (args.imageSize, args.imageSize)
    predict_fn = load_predictor(args.artifact)
    predict_fn(None, jnp.zeros((1, image_wh[1], image_wh[0], 3)))
    print("artifact predictor warm")
    service = DetectionService(predict_fn, None, classes_name, image_wh)
    run_server(service, args.host, args.port)


def _calibrate(model, variables, calib_dir, image_wh, max_images=32,
               margin=1.0, per_channel=False):
    """Calibrate static-int8 scales over a directory of images
    (`tmv_tpu/quant/static.py::calibrate_directory`)."""
    from tmv_tpu.quant.static import calibrate_directory

    print(f"calibrating int8 scales from {calib_dir}...")
    try:
        qv = calibrate_directory(model, variables, calib_dir, image_wh,
                                 max_images, margin=margin,
                                 per_channel=per_channel)
    except ValueError as e:
        raise SystemExit(f"--int8Static: {e}")
    print("int8 calibration done")
    return qv


def _serve_efficientdet(args):
    """Live EfficientDet serving: same HTTP contract via the
    `make_efficientdet_predict` adapter (simple single-image path)."""
    import jax
    import jax.numpy as jnp
    import optax

    from tmv_tpu.core.checkpoint import CheckpointManager
    from tmv_tpu.core.train_state import TrainState
    from tmv_tpu.data.loaders import load_classes
    from tmv_tpu.models.efficientdet import (
        EfficientDetNet, get_efficientdet_config,
    )
    from tmv_tpu.models.efficientdet.harness import (
        make_efficientdet_predict,
    )
    from tmv_tpu.ops.anchors import Anchors
    from tmv_tpu.serving.app import DetectionService, run_server

    classes_name, classes_num = load_classes(args.classesFile)
    cfg = get_efficientdet_config(args.modelName)
    cfg.num_classes = classes_num + 1  # background reserved at id 0
    cfg.image_size = args.imageSize
    cfg.levels_size = [args.imageSize]
    for _ in range(cfg.max_level):
        cfg.levels_size.append((cfg.levels_size[-1] + 1) // 2)
    anchors = Anchors(cfg.min_level, cfg.max_level,
                      (cfg.image_size, cfg.image_size), cfg.num_scales,
                      cfg.aspect_ratios, cfg.anchor_scale)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model = EfficientDetNet(config=cfg, dtype=dtype)
    image_wh = (cfg.image_size, cfg.image_size)
    x0 = jnp.zeros((1, image_wh[1], image_wh[0], 3), jnp.float32)
    variables = model.init(jax.random.key(0), x0, train=False)
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              optax.sgd(1e-3))
    state = CheckpointManager(args.modelPath).restore_weights(state)
    print(f"model at step {int(state.step)}")
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    batcher = None
    if args.batch > 1:
        from tmv_tpu.models.efficientdet.harness import (
            make_efficientdet_predict_batched,
        )
        from tmv_tpu.serving.batching import MicroBatcher

        batched = make_efficientdet_predict_batched(
            model, anchors, cfg.image_size)
        if args.dp:
            from tmv_tpu.parallel.inference import (
                make_sharded_batched_predictor,
            )

            batched, variables, mesh = make_sharded_batched_predictor(
                batched, variables, args.dp)
            print(f"data-parallel serving over {mesh.devices.size} devices")
        batched(variables,
                jnp.zeros((args.batch, image_wh[1], image_wh[0], 3)))
        batcher = MicroBatcher(batched, variables, max_batch=args.batch,
                               max_wait_ms=args.batchWaitMs)
        predict_fn = batcher.as_predict_fn()
    else:
        predict_fn = make_efficientdet_predict(model, anchors,
                                               cfg.image_size)
        if args.spatial:
            from tmv_tpu.parallel.inference import make_spatial_predictor

            predict_fn, variables, mesh = make_spatial_predictor(
                predict_fn, variables, args.spatial)
            print(f"spatial serving over {mesh.devices.size} devices "
                  "(image height sharded)")
        predict_fn(variables, x0)  # warm before accepting traffic
    print("predictor warm")
    service = DetectionService(predict_fn, variables, classes_name, image_wh)
    if batcher is not None:
        service.batcher = batcher  # /stats batch-size histogram
    run_server(service, args.host, args.port, threaded=args.batch > 1)


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from tmv_tpu.core.checkpoint import CheckpointManager
    from tmv_tpu.core.train_state import TrainState
    from tmv_tpu.data.loaders import load_anchors, load_classes
    from tmv_tpu.models.detector_harness import (
        build_yolo_model, make_yolo_predict,
    )
    from tmv_tpu.serving.app import DetectionService, run_server

    args = parse_args()
    if args.artifact:
        serve_artifact(args)
        return
    if args.family == "efficientdet":
        _serve_efficientdet(args)
        return
    anchors = load_anchors(args.anchorsFile)
    classes_name, classes_num = load_classes(args.classesFile)
    image_wh = (args.imageSize, args.imageSize)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model, iou_type = build_yolo_model(
        args.version, classes_num, anchors_per_scale=anchors.shape[1],
        dtype=dtype)

    x0 = jnp.zeros((1, image_wh[1], image_wh[0], 3), jnp.float32)
    variables = model.init(jax.random.key(0), x0, train=False)
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              optax.sgd(1e-3))
    mgr = CheckpointManager(args.modelPath)
    state = mgr.restore_weights(state)
    print(f"model at step {int(state.step)}")
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    if args.batch > 1:
        from tmv_tpu.models.detector_harness import make_yolo_predict_batched
        from tmv_tpu.serving.batching import MicroBatcher

        if args.int8Static:
            variables = _calibrate(model, variables, args.int8Static,
                                   image_wh, margin=args.int8Margin,
                                   per_channel=args.int8PerChannel)
        batched = make_yolo_predict_batched(
            model, image_wh, anchors, classes_num,
            confidence_thresh=0.5, scores_thresh=0.2, iou_thresh=0.5,
            iou_type=iou_type,
            quant="int8_static" if args.int8Static else "off",
        )
        if args.dp:
            from tmv_tpu.parallel.inference import (
                make_sharded_batched_predictor,
            )

            batched, variables, mesh = make_sharded_batched_predictor(
                batched, variables, args.dp)
            print(f"data-parallel serving over {mesh.devices.size} devices")
        batched(variables,
                jnp.zeros((args.batch, image_wh[1], image_wh[0], 3)))
        batcher = MicroBatcher(batched, variables, max_batch=args.batch,
                               max_wait_ms=args.batchWaitMs)
        predict_fn = batcher.as_predict_fn()
    else:
        quant = ("int8_static" if args.int8Static
                 else "int8" if args.int8 else "off")
        if args.int8Static:
            variables = _calibrate(model, variables, args.int8Static,
                                   image_wh, margin=args.int8Margin,
                                   per_channel=args.int8PerChannel)
        predict_fn = make_yolo_predict(
            model, image_wh, anchors, classes_num,
            confidence_thresh=0.5, scores_thresh=0.2, iou_thresh=0.5,
            iou_type=iou_type, quant=quant,
        )
        if args.spatial:
            from tmv_tpu.parallel.inference import make_spatial_predictor

            predict_fn, variables, mesh = make_spatial_predictor(
                predict_fn, variables, args.spatial)
            print(f"spatial serving over {mesh.devices.size} devices "
                  "(image height sharded)")
        # warm the jit cache before accepting traffic (import-time parity)
        predict_fn(variables, jnp.zeros((1, image_wh[1], image_wh[0], 3)))
    print("predictor warm")

    service = DetectionService(predict_fn, variables, classes_name, image_wh)
    if args.batch > 1:
        service.batcher = batcher  # /stats batch-size histogram
    run_server(service, args.host, args.port, threaded=args.batch > 1)


if __name__ == "__main__":
    main()
