"""WSGI entry module for uWSGI / gunicorn deploys.

Parity surface: `AIServer/ai_server/wsgi.py` + `AIServer/uwsgi.ini` — the
reference deploys the Django app behind uWSGI with the model loaded at
import time (`views/object_detection.py:17-37`).  Here the warm jitted
predictor is built once per worker process at module import, configured
via environment variables:

    TMV_MODEL_PATH     checkpoint dir            (default ./data/yolo_weights)
    TMV_CLASSES_FILE   classes txt               (required)
    TMV_FAMILY         yolo | efficientdet       (default yolo)
    TMV_ANCHORS_FILE   anchors csv               (required for yolo)
    TMV_VERSION        v3 | v4                   (default v4; yolo family)
    TMV_MODEL_NAME     efficientdet config name  (default efficientdet-d0)
    TMV_IMAGE_SIZE     letterbox size            (default 416)
    TMV_BF16           1 = bfloat16 compute      (default 1)

Point uWSGI at ``module = tmv_tpu.serving.wsgi:application`` (see
`deploy/uwsgi.ini`) or gunicorn at ``tmv_tpu.serving.wsgi:application``.
"""

import os


def _build_yolo_predictor(classes_num, image_size, dtype):
    import jax.numpy as jnp

    from tmv_tpu.data.loaders import load_anchors
    from tmv_tpu.models.detector_harness import make_yolo_predict
    from tmv_tpu.models.yolo_v3 import YoloV3
    from tmv_tpu.models.yolo_v4 import YoloV4

    anchors = load_anchors(os.environ["TMV_ANCHORS_FILE"])
    version = os.environ.get("TMV_VERSION", "v4")
    image_wh = (image_size, image_size)
    model_cls = YoloV4 if version == "v4" else YoloV3
    model = model_cls(classes_num=classes_num, dtype=dtype)
    predict = lambda: make_yolo_predict(  # noqa: E731
        model, image_wh, anchors, classes_num,
        confidence_thresh=0.5, scores_thresh=0.2, iou_thresh=0.5,
        iou_type="diou" if version == "v4" else "iou")
    return model, predict, image_wh


def _build_efficientdet_predictor(classes_num, image_size, dtype):
    from tmv_tpu.models.efficientdet import (
        EfficientDetNet, get_efficientdet_config,
    )
    from tmv_tpu.models.efficientdet.harness import (
        make_efficientdet_predict,
    )
    from tmv_tpu.ops.anchors import Anchors

    cfg = get_efficientdet_config(
        os.environ.get("TMV_MODEL_NAME", "efficientdet-d0"))
    cfg.num_classes = classes_num + 1  # background reserved at id 0
    cfg.image_size = image_size
    cfg.levels_size = [image_size]
    for _ in range(cfg.max_level):
        cfg.levels_size.append((cfg.levels_size[-1] + 1) // 2)
    anchors = Anchors(cfg.min_level, cfg.max_level,
                      (image_size, image_size), cfg.num_scales,
                      cfg.aspect_ratios, cfg.anchor_scale)
    model = EfficientDetNet(config=cfg, dtype=dtype)
    predict = lambda: make_efficientdet_predict(  # noqa: E731
        model, anchors, image_size)
    return model, predict, (image_size, image_size)


def build_application():
    import jax
    import jax.numpy as jnp
    import optax

    from tmv_tpu.core.checkpoint import CheckpointManager
    from tmv_tpu.core.train_state import TrainState
    from tmv_tpu.data.loaders import load_classes
    from tmv_tpu.serving.app import DetectionService, create_app

    model_path = os.environ.get("TMV_MODEL_PATH", "./data/yolo_weights")
    classes_file = os.environ["TMV_CLASSES_FILE"]
    family = os.environ.get("TMV_FAMILY", "yolo")
    image_size = int(os.environ.get("TMV_IMAGE_SIZE", "416"))
    bf16 = os.environ.get("TMV_BF16", "1") == "1"

    classes_name, classes_num = load_classes(classes_file)
    dtype = jnp.bfloat16 if bf16 else jnp.float32
    if family == "efficientdet":
        model, make_predict, image_wh = _build_efficientdet_predictor(
            classes_num, image_size, dtype)
    else:
        model, make_predict, image_wh = _build_yolo_predictor(
            classes_num, image_size, dtype)

    x0 = jnp.zeros((1, image_wh[1], image_wh[0], 3), jnp.float32)
    variables = model.init(jax.random.key(0), x0, train=False)
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              optax.sgd(1e-3))
    state = CheckpointManager(model_path).restore(state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    predict_fn = make_predict()
    service = DetectionService(predict_fn, variables, classes_name,
                               image_wh=image_wh)
    return create_app(service)


# uWSGI/gunicorn import this module per worker; skip when imported for docs
if os.environ.get("TMV_CLASSES_FILE"):
    application = build_application()
