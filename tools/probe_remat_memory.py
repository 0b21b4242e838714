"""Measure the HBM saving from remat (jax.checkpoint) on real train steps.

Compile-only: lowers the jitted train step with the direct and the
block-remat (``model.remat=True`` / ``cfg.remat``) variants and reads the
compiler's ``memory_analysis()`` — no execution, so this is cheap even
through the remote-compile tunnel.  (Whole-loss ``jax.checkpoint`` was
measured first and saved nothing — grad-of-checkpoint replays the forward
then runs the same backward; block-level ``nn.remat`` is the real lever.)  Demonstrates the memory
lever that makes high-resolution configs (EfficientDet-D4 @1024,
YOLOv4 @608 large-batch) trainable on a single 16 GB v5e chip.

Appends ``remat_*`` keys to baseline_measured.json.

Usage: python tools/probe_remat_memory.py [--small]
"""
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np


def analyze(step_fn, state, batch, rng):
    lowered = step_fn.lower(state, batch, rng)
    mem = lowered.compile().memory_analysis()
    # argument/output sizes are the same either way; temp is the
    # activation working set the remat trades against recompute
    return {
        "temp_mb": round(mem.temp_size_in_bytes / 2**20, 1),
        "total_mb": round(
            (mem.temp_size_in_bytes + mem.argument_size_in_bytes
             + mem.output_size_in_bytes) / 2**20, 1),
    }


def probe_yolo(size, batch, results, dtype_name="bf16"):
    import jax
    import jax.numpy as jnp
    import optax

    from tmv_tpu.core.train_state import TrainState, make_train_step
    from tmv_tpu.models.detector_harness import make_yolo_loss_fn
    from tmv_tpu.models.yolo_v4 import YoloV4

    from tmv_tpu.data.yolo_targets import make_yolo_targets

    anchors = np.array(
        [[[116, 90], [156, 198], [373, 326]],
         [[30, 61], [62, 45], [59, 119]],
         [[10, 13], [16, 30], [33, 23]]], np.float32) * size / 416
    tx = optax.adam(1e-4)
    rng_np = np.random.default_rng(0)
    gt_boxes = jnp.asarray(
        rng_np.uniform(20, size * 0.6, size=(batch, 6, 4))
        .astype(np.float32))
    gt_boxes = gt_boxes.at[..., 2:].set(gt_boxes[..., :2] + 60.0)
    gt_classes = jnp.asarray(
        rng_np.integers(0, 80, (batch, 6)).astype(np.int32))
    valid = jnp.ones((batch, 6), bool)
    targets = jax.jit(jax.vmap(
        lambda b, c, vl: make_yolo_targets(b, c, vl, anchors,
                                           (size, size), 80)
    ))(gt_boxes, gt_classes, valid)
    batch_data = {
        "image": jnp.zeros((batch, size, size, 3), jnp.float32),
        "targets": targets,
    }
    rng = jax.random.key(0)
    row = {}
    for remat in (False, True):
        model = YoloV4(classes_num=80, dtype=jnp.bfloat16, remat=remat)
        v = model.init(jax.random.key(0), jnp.zeros((1, size, size, 3)),
                       train=False)
        state = TrainState.create(v["params"], v["batch_stats"], tx)
        loss_fn = make_yolo_loss_fn(model, (size, size), anchors,
                                    iou_type="ciou")
        step = jax.jit(make_train_step(loss_fn, tx, shadow_loss=True))
        row["remat" if remat else "direct"] = analyze(
            step, state, batch_data, rng)
    tag = f"yolov4_{size}_b{batch}"
    print(f"{tag}: direct temp {row['direct']['temp_mb']} MB | "
          f"remat temp {row['remat']['temp_mb']} MB "
          f"({row['direct']['temp_mb'] / max(row['remat']['temp_mb'], 0.1):.2f}x)")
    results[f"remat_{tag}_direct_temp_mb"] = row["direct"]["temp_mb"]
    results[f"remat_{tag}_remat_temp_mb"] = row["remat"]["temp_mb"]


def probe_d0(name, size, batch, results):
    import jax
    import jax.numpy as jnp
    import optax

    from tmv_tpu.core.train_state import TrainState, make_train_step
    from tmv_tpu.models.efficientdet import (
        EfficientDetNet, get_efficientdet_config,
    )
    from tmv_tpu.models.efficientdet.net import make_efficientdet_loss_fn
    from tmv_tpu.ops.anchors import Anchors

    cfg = get_efficientdet_config(name)
    if size:
        cfg.image_size = size
        cfg.levels_size = [size]
        for _ in range(cfg.max_level):
            cfg.levels_size.append((cfg.levels_size[-1] + 1) // 2)
    size = cfg.image_size
    tx = optax.sgd(0.08, momentum=0.9)
    anchors = Anchors(cfg.min_level, cfg.max_level, (size, size),
                      cfg.num_scales, cfg.aspect_ratios, cfg.anchor_scale)
    rng_np = np.random.default_rng(0)
    gt_boxes = jnp.asarray(
        rng_np.uniform(50, size * 0.7, size=(batch, 4, 4))
        .astype(np.float32))
    gt_boxes = gt_boxes.at[..., 2:].set(gt_boxes[..., :2] + 80.0)
    gt_classes = jnp.asarray(
        rng_np.integers(1, cfg.num_classes - 1, (batch, 4))
        .astype(np.int32))
    boxes_t, classes_t, masks_t = jax.jit(jax.vmap(
        lambda b, c: anchors.generate_targets(b, c, cfg.num_classes)
    ))(gt_boxes, gt_classes)
    batch_data = {
        "image": jnp.zeros((batch, size, size, 3), jnp.float32),
        "boxes": boxes_t, "classes": classes_t, "masks": masks_t,
    }
    rng = jax.random.key(0)
    row = {}
    for remat in (False, True):
        cfg.remat = remat
        model = EfficientDetNet(config=cfg, dtype=jnp.bfloat16)
        v = model.init(jax.random.key(0), jnp.zeros((1, size, size, 3)),
                       train=False)
        state = TrainState.create(v["params"], v["batch_stats"], tx)
        loss_fn = make_efficientdet_loss_fn(model)
        step = jax.jit(make_train_step(loss_fn, tx, clip_global_norm=10.0))
        row["remat" if remat else "direct"] = analyze(
            step, state, batch_data, rng)
    tag = f"{name.replace('efficientdet-', '')}_{size}_b{batch}"
    print(f"{tag}: direct temp {row['direct']['temp_mb']} MB | "
          f"remat temp {row['remat']['temp_mb']} MB "
          f"({row['direct']['temp_mb'] / max(row['remat']['temp_mb'], 0.1):.2f}x)")
    results[f"remat_{tag}_direct_temp_mb"] = row["direct"]["temp_mb"]
    results[f"remat_{tag}_remat_temp_mb"] = row["remat"]["temp_mb"]


def main():
    results = {}
    if "--small" in sys.argv:
        probe_yolo(256, 4, results)
        probe_d0("efficientdet-d0", 256, 4, results)
    else:
        probe_yolo(608, 16, results)
        probe_d0("efficientdet-d0", 0, 32, results)
        probe_d0("efficientdet-d4", 0, 4, results)
    from tools._prov import update_measured
    update_measured(results)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
