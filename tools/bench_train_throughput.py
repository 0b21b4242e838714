"""Training-step throughput benchmark (EfficientDet-D0 + YOLOv4, bf16).

Measures full train-step images/sec/chip (forward + loss + backward +
optimizer) on the local accelerator with synthetic batches; appends to
baseline_measured.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 8
ITERS = 10


def run(step, state, batch, rng_key):
    import jax

    state, metrics = step(state, batch, rng_key)  # compile
    jax.block_until_ready(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, metrics = step(state, batch, rng_key)
    jax.block_until_ready(metrics["loss"])
    return BATCH * ITERS / (time.perf_counter() - t0)


def bench_efficientdet():
    import jax
    import jax.numpy as jnp
    import optax

    from tmv_tpu.core.train_state import TrainState, make_train_step
    from tmv_tpu.models.efficientdet import (
        EfficientDetNet, get_efficientdet_config,
    )
    from tmv_tpu.models.efficientdet.net import make_efficientdet_loss_fn
    from tmv_tpu.ops.anchors import Anchors

    cfg = get_efficientdet_config("efficientdet-d0")
    model = EfficientDetNet(config=cfg, dtype=jnp.bfloat16)
    size = cfg.image_size
    anchors = Anchors(cfg.min_level, cfg.max_level, (size, size),
                      cfg.num_scales, cfg.aspect_ratios, cfg.anchor_scale)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(BATCH, size, size, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x[:1], train=False)
    gt_boxes = jnp.asarray(
        rng.uniform(50, 400, size=(BATCH, 4, 4)).astype(np.float32))
    gt_boxes = gt_boxes.at[..., 2:].set(gt_boxes[..., :2] + 80.0)
    gt_classes = jnp.asarray(rng.integers(1, 80, (BATCH, 4)).astype(np.int32))
    boxes_t, classes_t, masks_t = jax.jit(jax.vmap(
        lambda b, c: anchors.generate_targets(b, c, cfg.num_classes)
    ))(gt_boxes, gt_classes)
    batch = {"image": x, "boxes": boxes_t, "classes": classes_t,
             "masks": masks_t}

    tx = optax.sgd(0.01, momentum=0.9)
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              tx, ema_decay=0.9998)
    step = jax.jit(make_train_step(
        make_efficientdet_loss_fn(model), tx, clip_global_norm=10.0,
        ema_decay=0.9998))
    return run(step, state, batch, jax.random.key(0))


def bench_yolov4(size=416):
    import jax
    import jax.numpy as jnp
    import optax

    from tmv_tpu.core.train_state import TrainState, make_train_step
    from tmv_tpu.data.yolo_targets import make_yolo_targets
    from tmv_tpu.models.detector_harness import make_yolo_loss_fn
    from tmv_tpu.models.yolo_v4 import YoloV4

    anchors = np.array(
        [[[116, 90], [156, 198], [373, 326]],
         [[30, 61], [62, 45], [59, 119]],
         [[10, 13], [16, 30], [33, 23]]], np.float32)
    model = YoloV4(classes_num=80, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(BATCH, size, size, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x[:1], train=False)
    gt_boxes = jnp.asarray(
        rng.uniform(20, 300, size=(BATCH, 6, 4)).astype(np.float32))
    gt_boxes = gt_boxes.at[..., 2:].set(gt_boxes[..., :2] + 60.0)
    gt_classes = jnp.asarray(rng.integers(0, 80, (BATCH, 6)).astype(np.int32))
    valid = jnp.ones((BATCH, 6), bool)
    targets = jax.jit(jax.vmap(
        lambda b, c, v: make_yolo_targets(b, c, v, anchors, (size, size), 80)
    ))(gt_boxes, gt_classes, valid)
    batch = {"image": x, "targets": targets}

    tx = optax.adam(1e-4)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    step = jax.jit(make_train_step(
        make_yolo_loss_fn(model, (size, size), anchors, iou_type="ciou"),
        tx, shadow_loss=True))
    return run(step, state, batch, jax.random.key(0))


def main():
    results = {
        "efficientdet_d0_train_images_per_sec": round(bench_efficientdet(), 2),
        "yolov4_416_train_images_per_sec": round(bench_yolov4(416), 2),
    }
    print(json.dumps(results))
    from tools._prov import update_measured
    update_measured(results)


if __name__ == "__main__":
    main()
