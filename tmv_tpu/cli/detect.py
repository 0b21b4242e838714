"""Single-image detection CLI: load checkpoint, predict, draw, save.

Parity surface: `yolo_v3/test.py` / `yolo_v4/test.py:28-112` — letterbox,
predict, un-letterbox, draw boxes with class/score, write the result image.
``--family efficientdet`` routes the same flow through
``make_efficientdet_predict`` (decode → background filter → DIoU-NMS, the
eval semantics of `efficientdet_net_train.py:135-169`).
"""

import argparse

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--image", required=True)
    p.add_argument("--out", default="./result.jpg")
    p.add_argument("--modelPath", required=True)
    p.add_argument("--classesFile", required=True)
    p.add_argument("--anchorsFile", default=None,
                   help="anchors csv (required for --family yolo; the "
                        "efficientdet family generates anchors from its "
                        "config)")
    p.add_argument("--family", default="yolo",
                   choices=["yolo", "efficientdet"])
    p.add_argument("--modelName", default="efficientdet-d0",
                   help="efficientdet config name (family=efficientdet)")
    p.add_argument("--version", default="v4",
                   choices=["v3", "v4", "resnet"],
                   help="'resnet' = the MoCo/distill ResNet50V2+YOLOv3-head "
                        "detector (finetuned/distilled checkpoints)")
    p.add_argument("--imageSize", type=int, default=416)
    p.add_argument("--confidenceThresh", type=float, default=0.5)
    p.add_argument("--scoresThresh", type=float, default=0.2)
    p.add_argument("--iouThresh", type=float, default=0.5)
    args = p.parse_args()
    if args.family == "yolo" and not args.anchorsFile:
        p.error("--anchorsFile is required for --family yolo")
    return args


def _build_yolo(args, classes_num):
    from tmv_tpu.data.loaders import load_anchors
    from tmv_tpu.models.detector_harness import (
        build_yolo_model, make_yolo_predict,
    )

    anchors = load_anchors(args.anchorsFile)
    image_wh = (args.imageSize, args.imageSize)
    model, iou_type = build_yolo_model(
        args.version, classes_num, anchors_per_scale=anchors.shape[1])
    predict = lambda variables: make_yolo_predict(  # noqa: E731
        model, image_wh, anchors, classes_num,
        confidence_thresh=args.confidenceThresh,
        scores_thresh=args.scoresThresh, iou_thresh=args.iouThresh,
        iou_type=iou_type,
    )
    return model, predict, image_wh


def _build_efficientdet(args, classes_num):
    from tmv_tpu.models.efficientdet import (
        EfficientDetNet, get_efficientdet_config,
    )
    from tmv_tpu.models.efficientdet.harness import (
        make_efficientdet_predict,
    )
    from tmv_tpu.ops.anchors import Anchors

    cfg = get_efficientdet_config(args.modelName)
    cfg.num_classes = classes_num + 1  # background reserved at id 0
    cfg.image_size = args.imageSize
    cfg.levels_size = [args.imageSize]
    for _ in range(cfg.max_level):
        cfg.levels_size.append((cfg.levels_size[-1] + 1) // 2)
    anchors = Anchors(cfg.min_level, cfg.max_level,
                      (cfg.image_size, cfg.image_size), cfg.num_scales,
                      cfg.aspect_ratios, cfg.anchor_scale)
    model = EfficientDetNet(config=cfg)
    predict = lambda variables: make_efficientdet_predict(  # noqa: E731
        model, anchors, cfg.image_size,
        iou_threshold=args.iouThresh, score_threshold=args.scoresThresh,
    )
    return model, predict, (cfg.image_size, cfg.image_size)


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from tmv_tpu.core.checkpoint import CheckpointManager
    from tmv_tpu.core.train_state import TrainState
    from tmv_tpu.data.loaders import load_classes
    from tmv_tpu.serving.app import DetectionService
    from tmv_tpu.utils import image_helper

    args = parse_args()
    classes_name, classes_num = load_classes(args.classesFile)
    if args.family == "efficientdet":
        model, make_predict, image_wh = _build_efficientdet(
            args, classes_num)
    else:
        model, make_predict, image_wh = _build_yolo(args, classes_num)
    x0 = jnp.zeros((1, image_wh[1], image_wh[0], 3))
    variables = model.init(jax.random.key(0), x0, train=False)
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              optax.sgd(1e-3))
    state = CheckpointManager(args.modelPath).restore_weights(state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    predict_fn = make_predict(variables)
    service = DetectionService(predict_fn, variables, classes_name, image_wh)
    img = image_helper.bytes_to_image(open(args.image, "rb").read())
    boxes, ids, scores, _ = service.predict_image(img)
    labels = [classes_name[i] for i in ids]
    for b, l, s in zip(boxes, labels, scores):
        print(f"{l} {s:.3f} {b.tolist()}")
    result = image_helper.draw_boxes(img, boxes, labels, scores)
    image_helper.image_to_file(args.out, result)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
