"""Slope-method benchmarks for all headline models (honest device numbers).

The axon dev backend has a ~30 ms per-dispatch RPC floor and an unreliable
``block_until_ready``; all numbers here are measured as the *slope* between
k-chained executions inside a single jit (data-dependent, host-fetched), so
the RPC constant cancels.  Overwrites the corresponding entries in
baseline_measured.json.
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K_SMALL, K_LARGE = 1, 5


def slope_time(fn, reps=3):
    """fn(k) -> host scalar; returns seconds per unit k."""
    _ = fn(K_SMALL)
    best_s = min(_timeit(fn, K_SMALL) for _ in range(reps))
    _ = fn(K_LARGE)
    best_l = min(_timeit(fn, K_LARGE) for _ in range(reps))
    return (best_l - best_s) / (K_LARGE - K_SMALL)


def _timeit(fn, k):
    t0 = time.perf_counter()
    fn(k)
    return time.perf_counter() - t0


def bench_infer(model_apply, variables, x0):
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnums=2)
    def chain(v, x, k):
        def body(i, carry):
            outs = model_apply(v, carry)
            s = sum(jnp.sum(o.astype(jnp.float32)) for o in outs)
            return carry + (s * 1e-12).astype(carry.dtype)
        return jnp.sum(jax.lax.fori_loop(0, k, body, x).astype(jnp.float32))

    per = slope_time(lambda k: np.asarray(chain(variables, x0, k)))
    return x0.shape[0] / per


def bench_train(step_fn, state, batch, rng_key):
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnums=3)
    def chain(state, batch, key, k):
        def body(carry, _):
            st, _m = carry
            st2, m = step_fn(st, batch, key)
            return (st2, m["loss"]), None
        (st, loss), _ = jax.lax.scan(body, (state, jnp.float32(0)), None,
                                     length=k)
        return loss

    per = slope_time(lambda k: np.asarray(chain(state, batch, rng_key, k)))
    return batch["image"].shape[0] / per


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from tmv_tpu.core.train_state import TrainState, make_train_step
    from tmv_tpu.data.yolo_targets import make_yolo_targets
    from tmv_tpu.models.detector_harness import make_yolo_loss_fn
    from tmv_tpu.models.efficientdet import (
        EfficientDetNet, get_efficientdet_config,
    )
    from tmv_tpu.models.efficientdet.net import make_efficientdet_loss_fn
    from tmv_tpu.models.yolo_v4 import YoloV4
    from tmv_tpu.ops.anchors import Anchors

    rng = np.random.default_rng(0)
    results = {}

    # --- EfficientDet-D0 inference
    cfg = get_efficientdet_config("efficientdet-d0")
    d0 = EfficientDetNet(config=cfg, dtype=jnp.bfloat16)
    s = cfg.image_size
    v = d0.init(jax.random.key(0), jnp.zeros((1, s, s, 3)), train=False)
    x = jnp.asarray(rng.uniform(size=(64, s, s, 3)).astype(np.float32))
    results["efficientdet_d0_infer_images_per_sec"] = round(bench_infer(
        lambda vv, xx: d0.apply(vv, xx, train=False)[0], v, x), 1)

    # --- YOLOv4 inference @416 and @640
    anchors_np = np.array(
        [[[116, 90], [156, 198], [373, 326]],
         [[30, 61], [62, 45], [59, 119]],
         [[10, 13], [16, 30], [33, 23]]], np.float32)
    for size in (416, 640):
        y4 = YoloV4(classes_num=80, dtype=jnp.bfloat16)
        vy = y4.init(jax.random.key(0), jnp.zeros((1, size, size, 3)),
                     train=False)
        xy = jnp.asarray(
            rng.uniform(size=(32, size, size, 3)).astype(np.float32))
        results[f"yolov4_{size}_infer_images_per_sec"] = round(bench_infer(
            lambda vv, xx, m=y4: m.apply(vv, xx, train=False), vy, xy), 1)

    # --- D0 train step
    B = 8
    anch = Anchors(cfg.min_level, cfg.max_level, (s, s), cfg.num_scales,
                   cfg.aspect_ratios, cfg.anchor_scale)
    gt_b = jnp.asarray(rng.uniform(50, 400, size=(B, 4, 4)).astype(np.float32))
    gt_b = gt_b.at[..., 2:].set(gt_b[..., :2] + 80.0)
    gt_c = jnp.asarray(rng.integers(1, 80, (B, 4)).astype(np.int32))
    bt, ct, mt = jax.jit(jax.vmap(
        lambda b, c: anch.generate_targets(b, c, cfg.num_classes)))(gt_b, gt_c)
    batch = {"image": jnp.asarray(
        rng.uniform(size=(B, s, s, 3)).astype(np.float32)),
        "boxes": bt, "classes": ct, "masks": mt}
    tx = optax.sgd(0.01, momentum=0.9)
    st = TrainState.create(v["params"], v["batch_stats"], tx)
    step = make_train_step(make_efficientdet_loss_fn(d0), tx,
                           clip_global_norm=10.0)
    results["efficientdet_d0_train_images_per_sec"] = round(
        bench_train(step, st, batch, jax.random.key(0)), 1)

    # --- YOLOv4 train step @416
    size = 416
    y4 = YoloV4(classes_num=80, dtype=jnp.bfloat16)
    vy = y4.init(jax.random.key(0), jnp.zeros((1, size, size, 3)),
                 train=False)
    gt_b = jnp.asarray(rng.uniform(20, 300, size=(B, 6, 4)).astype(np.float32))
    gt_b = gt_b.at[..., 2:].set(gt_b[..., :2] + 60.0)
    gt_c = jnp.asarray(rng.integers(0, 80, (B, 6)).astype(np.int32))
    valid = jnp.ones((B, 6), bool)
    targets = jax.jit(jax.vmap(
        lambda b, c, vv: make_yolo_targets(b, c, vv, anchors_np,
                                           (size, size), 80)))(gt_b, gt_c,
                                                               valid)
    ybatch = {"image": jnp.asarray(
        rng.uniform(size=(B, size, size, 3)).astype(np.float32)),
        "targets": targets}
    ytx = optax.adam(1e-4)
    yst = TrainState.create(vy["params"], vy["batch_stats"], ytx)
    ystep = make_train_step(
        make_yolo_loss_fn(y4, (size, size), anchors_np, iou_type="ciou"),
        ytx, shadow_loss=True)
    results["yolov4_416_train_images_per_sec"] = round(
        bench_train(ystep, yst, ybatch, jax.random.key(0)), 1)

    print(json.dumps(results))
    from tools._prov import update_measured
    results["method_note"] = (
        "slope method: k-chained executions in one jit, host-fetched; "
        "cancels the ~30ms axon RPC floor and its unreliable "
        "block_until_ready"
    )
    update_measured(results)


if __name__ == "__main__":
    main()
