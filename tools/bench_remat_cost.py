"""Measure the step-time cost of block-level remat on the real TPU.

Companion to tools/probe_remat_memory.py (which measures the peak-HBM
win): remat trades ~one extra forward of FLOPs for memory, and this
probe records what that actually costs wall-clock on the chip.

Honest-timing protocol for the axon tunnel (block_until_ready is not a
completion barrier there — see CLAUDE.md): train steps are chained
through the state pytree (data-dependent), the final loss is fetched to
host with float() (a real device→host copy), and two run lengths are
differenced to cancel dispatch/fetch overhead.

Appends ``remat_cost_*`` keys to baseline_measured.json.
"""
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np

N1, N2 = 4, 12


def time_steps(step, state, batch, rng, n):
    s = state
    t0 = time.perf_counter()
    for _ in range(n):
        s, metrics = step(s, batch, rng)
    _ = float(metrics["loss"])  # true completion barrier
    return time.perf_counter() - t0


def slope_ips(step, state, batch, rng, batch_size):
    # warm compile + one throwaway timed pass
    time_steps(step, state, batch, rng, 1)
    t1 = time_steps(step, state, batch, rng, N1)
    t2 = time_steps(step, state, batch, rng, N2)
    per_step = (t2 - t1) / (N2 - N1)
    return batch_size / per_step, per_step * 1e3


def bench_yolo(size, batch, results):
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
        "image": jnp.asarray(rng_np.uniform(
            size=(batch, size, size, 3)).astype(np.float32)),
        "targets": targets,
    }
    rng = jax.random.key(0)
    for remat in (False, True):
        model = YoloV4(classes_num=80, dtype=jnp.bfloat16, remat=remat)
        v = model.init(jax.random.key(0), jnp.zeros((1, size, size, 3)),
                       train=False)
        state = TrainState.create(v["params"], v["batch_stats"], tx)
        loss_fn = make_yolo_loss_fn(model, (size, size), anchors,
                                    iou_type="ciou")
        step = jax.jit(make_train_step(loss_fn, tx, shadow_loss=True))
        ips, ms = slope_ips(step, state, batch_data, rng, batch)
        key = f"remat_cost_yolov4_{size}_b{batch}" + (
            "_remat" if remat else "_direct")
        results[key + "_ips"] = round(ips, 2)
        print(f"{key}: {ips:.1f} img/s ({ms:.1f} ms/step)")


def bench_d0(size, batch, results):
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
        "image": jnp.asarray(rng_np.uniform(
            size=(batch, size, size, 3)).astype(np.float32)),
        "boxes": boxes_t, "classes": classes_t, "masks": masks_t,
    }
    rng = jax.random.key(0)
    for remat in (False, True):
        cfg.remat = remat
        model = EfficientDetNet(config=cfg, dtype=jnp.bfloat16)
        v = model.init(jax.random.key(0), jnp.zeros((1, size, size, 3)),
                       train=False)
        state = TrainState.create(v["params"], v["batch_stats"], tx)
        loss_fn = make_efficientdet_loss_fn(model)
        step = jax.jit(make_train_step(loss_fn, tx, clip_global_norm=10.0))
        ips, ms = slope_ips(step, state, batch_data, rng, batch)
        key = f"remat_cost_d0_{size}_b{batch}" + (
            "_remat" if remat else "_direct")
        results[key + "_ips"] = round(ips, 2)
        print(f"{key}: {ips:.1f} img/s ({ms:.1f} ms/step)")


def main():
    results = {}
    bench_yolo(608, 8, results)
    bench_d0(512, 8, results)
    from tools._prov import update_measured
    update_measured(results)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
