"""Host input-pipeline throughput: can staging actually FEED the chip?

Round-2 verdict weak #3: the recorded train rates (313–428 img/s jitted
step, PARITY §6) were measured on pre-built synthetic device batches; the
threaded host staging (`data/yolo_pipeline.py`, PIL-based efficientdet aug)
had never been measured.  On a host-bound box the pipeline — not the TPU —
is the likely training bottleneck (BASELINE.md config #4: "augmented train
step").

This tool measures, per family:
- ``stage_ips``   — host-side staging only (JPEG decode + resize/aug +
  label padding), the hard upper bound on what the host can feed;
- ``iter_ips``    — the full pipeline iterator (staging + device batch aug
  + target building), forcing one scalar fetch per batch so device work
  cannot hide behind async dispatch (fetch ≈30 ms RPC on the axon tunnel,
  i.e. ≲4 ms/img at batch 8 — noted, not corrected);
- ``train_ips``   — the augmented train step: the real jitted train step
  consuming the pipeline iterator (BASELINE.md config #4), wall clock over
  a step window with the loss fetched at the end.

Appends to ``baseline_measured.json``.  Run on TPU or CPU.
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 8
WARM_BATCHES = 3
MEAS_BATCHES = 16


def make_dataset(root, n=160, w=640, h=480):
    from PIL import Image

    img_dir = os.path.join(root, "imgs")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    lines = []
    for i in range(n):
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        entries = []
        for _ in range(int(rng.integers(1, 5))):
            x1 = int(rng.integers(0, w - 90))
            y1 = int(rng.integers(0, h - 90))
            bw, bh = int(rng.integers(30, 80)), int(rng.integers(30, 80))
            cls = "a" if rng.uniform() < 0.5 else "b"
            entries.append(f"{cls},{x1},{y1},{x1 + bw},{y1 + bh}")
        name = f"im{i}.jpg"
        Image.fromarray(img).save(os.path.join(img_dir, name), quality=90)
        lines.append(f"{name}|{'|'.join(entries)}|")
    with open(os.path.join(root, "labels.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    with open(os.path.join(root, "classes.txt"), "w") as f:
        f.write("a\nb\n")
    return (os.path.join(root, "imgs"), os.path.join(root, "labels.txt"),
            os.path.join(root, "classes.txt"))


def _measure_stage(stage_batch_fn, labels_iter, batch):
    for _ in range(WARM_BATCHES):
        stage_batch_fn([next(labels_iter) for _ in range(batch)])
    t0 = time.perf_counter()
    for _ in range(MEAS_BATCHES):
        stage_batch_fn([next(labels_iter) for _ in range(batch)])
    dt = time.perf_counter() - t0
    return batch * MEAS_BATCHES / dt


def _measure_iter(pipeline, fetch):
    it = iter(pipeline)
    for _ in range(WARM_BATCHES):
        fetch(next(it))
    t0 = time.perf_counter()
    for _ in range(MEAS_BATCHES):
        fetch(next(it))
    dt = time.perf_counter() - t0
    return BATCH * MEAS_BATCHES / dt


def bench_yolo(img_dir, labels, classes, size=608):
    import jax

    from tmv_tpu.data.yolo_pipeline import YoloDataPipeline

    anchors = np.array(
        [[[116, 90], [156, 198], [373, 326]],
         [[30, 61], [62, 45], [59, 119]],
         [[10, 13], [16, 30], [33, 23]]], np.float32) * size / 416
    pipe = YoloDataPipeline(
        img_dir, labels, classes, batch_size=BATCH, anchors=anchors,
        image_wh=(size, size), image_random=True, mosaic=1.0,
        label_mean=False, prefetch=2,
    )
    # staging only (host): thread-pooled decode+resize+pad
    from concurrent.futures import ThreadPoolExecutor

    pipe._pool = ThreadPoolExecutor(min(8, BATCH))
    it = iter(pipe.sampler)
    stage_ips = _measure_stage(pipe._stage_batch, it, BATCH)

    def fetch(b):
        np.asarray(jax.device_get(b["image"][0, 0, 0, 0]))

    iter_ips = _measure_iter(pipe, fetch)
    return stage_ips, iter_ips


def bench_efficientdet(img_dir, labels, classes, size=512):
    import jax

    from tmv_tpu.data.efficientdet_pipeline import EfficientDetPipeline
    from tmv_tpu.ops.anchors import Anchors

    anchors = Anchors(3, 7, (size, size), 3,
                      [(1.0, 1.0), (1.4, 0.7), (0.7, 1.4)], 4.0)
    pipe = EfficientDetPipeline(
        img_dir, labels, classes, batch_size=BATCH, anchors=anchors,
        num_classes=3, image_size=size, augment=True, label_mean=False,
    )
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(min(8, BATCH))
    it = iter(pipe.sampler)
    rng_seed = [0]

    def stage_batch(lbs):
        rng_seed[0] += 1
        items = [(lb, rng_seed[0] * 1000 + i) for i, lb in enumerate(lbs)]
        return list(pool.map(lambda a: pipe._get_random_data(*a), items))

    stage_ips = _measure_stage(stage_batch, it, BATCH)

    def fetch(b):
        np.asarray(jax.device_get(b["image"][0, 0, 0, 0]))

    iter_ips = _measure_iter(pipe, fetch)

    # device-aug variant: host decode+letterbox only, blur/affine/noise
    # as a jitted device program (`data/device_aug.py`)
    pipe_dev = EfficientDetPipeline(
        img_dir, labels, classes, batch_size=BATCH, anchors=anchors,
        num_classes=3, image_size=size, augment=True, label_mean=False,
        device_aug=True,
    )
    devaug_iter_ips = _measure_iter(pipe_dev, fetch)
    return stage_ips, iter_ips, devaug_iter_ips


def _measure_train(step, state0, batches_iter, warm=3, meas=12):
    """img/s of the real jitted train step consuming ``batches_iter``.

    The state chains through every step (data dependency), and the final
    loss is host-fetched, so the wall clock covers all device work even
    though axon's block_until_ready is not a barrier.  The ~30 ms/step
    dispatch RPC of the dev tunnel is included — identical for the
    synthetic and pipeline-fed variants, so their *ratio* isolates the
    host-staging cost.
    """
    import jax

    state = state0
    for i in range(warm):
        state, m = step(state, next(batches_iter), jax.random.key(i))
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(meas):
        state, m = step(state, next(batches_iter), jax.random.key(100 + i))
    float(m["loss"])
    dt = time.perf_counter() - t0
    return BATCH * meas / dt


def bench_train_yolo(img_dir, labels, classes, size=608):
    """YOLOv4 @608 mosaic-augmented training: synthetic-batch vs
    pipeline-fed (BASELINE.md config #4)."""
    import itertools

    import jax
    import jax.numpy as jnp
    import optax

    from tmv_tpu.core.train_state import TrainState, make_train_step
    from tmv_tpu.data.yolo_pipeline import YoloDataPipeline
    from tmv_tpu.models.detector_harness import make_yolo_loss_fn
    from tmv_tpu.models.yolo_v4 import YoloV4

    anchors = np.array(
        [[[116, 90], [156, 198], [373, 326]],
         [[30, 61], [62, 45], [59, 119]],
         [[10, 13], [16, 30], [33, 23]]], np.float32) * size / 416
    pipe = YoloDataPipeline(
        img_dir, labels, classes, batch_size=BATCH, anchors=anchors,
        image_wh=(size, size), image_random=True, mosaic=1.0,
        label_mean=False, prefetch=2,
    )
    model = YoloV4(classes_num=pipe.classes_num, dtype=jnp.bfloat16)
    v = model.init(jax.random.key(0), jnp.zeros((1, size, size, 3)),
                   train=False)
    tx = optax.adam(1e-4)
    state = TrainState.create(v["params"], v["batch_stats"], tx)
    loss_fn = make_yolo_loss_fn(model, (size, size), anchors,
                                iou_type="ciou")
    step = jax.jit(make_train_step(loss_fn, tx, shadow_loss=True))

    it = iter(pipe)
    fixed = next(it)
    synth_ips = _measure_train(step, state, itertools.repeat(fixed))
    fed_ips = _measure_train(step, state, it)

    # epoch-persistent staging cache: prefill (epoch 1), then measure the
    # steady-state epochs the cache actually serves
    pipe_c = YoloDataPipeline(
        img_dir, labels, classes, batch_size=BATCH, anchors=anchors,
        image_wh=(size, size), image_random=True, mosaic=1.0,
        label_mean=False, prefetch=2,
        cache_dir=os.path.join(os.path.dirname(img_dir),
                               "train_cache_yolo"),
    )
    for lb in pipe_c.labels:
        pipe_c._stage_one(lb)
    cached_fed_ips = _measure_train(step, state, iter(pipe_c))
    return synth_ips, fed_ips, cached_fed_ips


def bench_train_d0(img_dir, labels, classes, size=512):
    import itertools

    import jax
    import jax.numpy as jnp
    import optax

    from tmv_tpu.core.train_state import TrainState, make_train_step
    from tmv_tpu.data.efficientdet_pipeline import EfficientDetPipeline
    from tmv_tpu.models.efficientdet import (
        EfficientDetNet, get_efficientdet_config,
    )
    from tmv_tpu.models.efficientdet.net import make_efficientdet_loss_fn
    from tmv_tpu.ops.anchors import Anchors

    cfg = get_efficientdet_config("efficientdet-d0")
    anchors = Anchors(cfg.min_level, cfg.max_level, (size, size),
                      cfg.num_scales, cfg.aspect_ratios, cfg.anchor_scale)
    pipe = EfficientDetPipeline(
        img_dir, labels, classes, batch_size=BATCH, anchors=anchors,
        num_classes=cfg.num_classes, image_size=size, augment=True,
        label_mean=False,
    )
    pipe_dev = EfficientDetPipeline(
        img_dir, labels, classes, batch_size=BATCH, anchors=anchors,
        num_classes=cfg.num_classes, image_size=size, augment=True,
        label_mean=False, device_aug=True,
    )
    model = EfficientDetNet(config=cfg, dtype=jnp.bfloat16)
    v = model.init(jax.random.key(0), jnp.zeros((1, size, size, 3)),
                   train=False)
    tx = optax.sgd(0.01, momentum=0.9)
    state = TrainState.create(v["params"], v["batch_stats"], tx,
                              ema_decay=0.9998)
    loss_fn = make_efficientdet_loss_fn(model)
    step = jax.jit(make_train_step(loss_fn, tx, clip_global_norm=10.0,
                                   ema_decay=0.9998))

    it = iter(pipe)
    fixed = next(it)
    synth_ips = _measure_train(step, state, itertools.repeat(fixed))
    fed_ips = _measure_train(step, state, it)
    devaug_fed_ips = _measure_train(step, state, iter(pipe_dev))

    pipe_cached = EfficientDetPipeline(
        img_dir, labels, classes, batch_size=BATCH, anchors=anchors,
        num_classes=cfg.num_classes, image_size=size, augment=True,
        label_mean=False, device_aug=True,
        cache_dir=os.path.join(os.path.dirname(img_dir),
                               "train_cache_ed"))
    for lb in pipe_cached.labels:
        pipe_cached._stage_fixed(lb)
    cached_fed_ips = _measure_train(step, state, iter(pipe_cached))
    return synth_ips, fed_ips, devaug_fed_ips, cached_fed_ips


def bench_stage_devaug(img_dir, labels, classes, size=512):
    """Host staging of the device-aug path: native decode+letterbox only
    (`efficientdet_pipeline._stage_fixed`) — the rate the host can feed
    when augmentation runs on-device."""
    from concurrent.futures import ThreadPoolExecutor

    from tmv_tpu.data.efficientdet_pipeline import EfficientDetPipeline
    from tmv_tpu.ops.anchors import Anchors

    anchors = Anchors(3, 7, (size, size), 3,
                      [(1.0, 1.0), (1.4, 0.7), (0.7, 1.4)], 4.0)
    pipe = EfficientDetPipeline(
        img_dir, labels, classes, batch_size=BATCH, anchors=anchors,
        num_classes=3, image_size=size, augment=True, label_mean=False,
        device_aug=True,
    )
    pool = ThreadPoolExecutor(min(8, BATCH))
    it = iter(pipe.sampler)

    def stage_batch(lbs):
        return list(pool.map(pipe._stage_fixed, lbs))

    return _measure_stage(stage_batch, it, BATCH)


def main():
    import jax

    root = tempfile.mkdtemp(prefix="tmv_pipe_bench_")
    img_dir, labels, classes = make_dataset(root)

    if "--stage-only" in sys.argv:
        # host-only rates (no accelerator needed): what can the host FEED?
        from concurrent.futures import ThreadPoolExecutor

        from tmv_tpu.data.yolo_pipeline import YoloDataPipeline

        anchors = np.array(
            [[[116, 90], [156, 198], [373, 326]],
             [[30, 61], [62, 45], [59, 119]],
             [[10, 13], [16, 30], [33, 23]]], np.float32) * 608 / 416
        pipe = YoloDataPipeline(
            img_dir, labels, classes, batch_size=BATCH, anchors=anchors,
            image_wh=(608, 608), image_random=True, label_mean=False,
            prefetch=0,
        )
        pipe._pool = ThreadPoolExecutor(min(8, BATCH))
        y_stage = _measure_stage(pipe._stage_batch, iter(pipe.sampler),
                                 BATCH)

        from tmv_tpu.data.efficientdet_pipeline import EfficientDetPipeline
        from tmv_tpu.ops.anchors import Anchors

        ed_anchors = Anchors(3, 7, (512, 512), 3,
                             [(1.0, 1.0), (1.4, 0.7), (0.7, 1.4)], 4.0)
        ed = EfficientDetPipeline(
            img_dir, labels, classes, batch_size=BATCH, anchors=ed_anchors,
            num_classes=3, image_size=512, augment=True, label_mean=False,
        )
        pool = ThreadPoolExecutor(min(8, BATCH))
        seed = [0]

        def ed_stage(lbs):
            seed[0] += 1
            return list(pool.map(
                lambda a: ed._get_random_data(*a),
                [(lb, seed[0] * 1000 + i) for i, lb in enumerate(lbs)]))

        e_stage = _measure_stage(ed_stage, iter(ed.sampler), BATCH)
        e_dev_stage = bench_stage_devaug(img_dir, labels, classes)

        # epoch-persistent staging cache (`data/stage_cache.py`): fill it
        # once (epoch 1), then measure pure memmap reads (epoch 2+)
        cache_root = os.path.join(root, "stage_cache_yolo")
        pipe_c = YoloDataPipeline(
            img_dir, labels, classes, batch_size=BATCH, anchors=anchors,
            image_wh=(608, 608), image_random=True, label_mean=False,
            prefetch=0, cache_dir=cache_root,
        )
        pipe_c._pool = ThreadPoolExecutor(min(8, BATCH))
        for lb in pipe_c.labels:  # fill every row once
            pipe_c._stage_one(lb)
        y_cached = _measure_stage(pipe_c._stage_batch,
                                  iter(pipe_c.sampler), BATCH)

        ed_c = EfficientDetPipeline(
            img_dir, labels, classes, batch_size=BATCH, anchors=ed_anchors,
            num_classes=3, image_size=512, augment=True, label_mean=False,
            device_aug=True,
            cache_dir=os.path.join(root, "stage_cache_ed"))
        for lb in ed_c.labels:
            ed_c._stage_fixed(lb)
        ed_pool = ThreadPoolExecutor(min(8, BATCH))

        def ed_cached_stage(lbs):
            return list(ed_pool.map(ed_c._stage_fixed, lbs))

        e_cached = _measure_stage(ed_cached_stage, iter(ed_c.sampler),
                                  BATCH)
        results = {
            "pipeline_yolo608_stage_ips": round(y_stage, 2),
            "pipeline_yolo608_cached_stage_ips": round(y_cached, 2),
            "pipeline_efficientdet512_stage_ips": round(e_stage, 2),
            "pipeline_efficientdet512_devaug_stage_ips":
                round(e_dev_stage, 2),
            "pipeline_efficientdet512_cached_stage_ips": round(e_cached, 2),
            "pipeline_bench_host_cpus": os.cpu_count(),
        }
        print(json.dumps(results))
        from tools._prov import update_measured
        update_measured(results)
        return

    y_stage, y_iter = bench_yolo(img_dir, labels, classes)
    e_stage, e_iter, e_dev_iter = bench_efficientdet(img_dir, labels,
                                                     classes)
    y_synth, y_fed, y_cached_fed = bench_train_yolo(img_dir, labels,
                                                    classes)
    e_synth, e_fed, e_dev_fed, e_cached_fed = bench_train_d0(
        img_dir, labels, classes)
    results = {
        "pipeline_yolo608_stage_ips": round(y_stage, 2),
        "pipeline_yolo608_iter_ips": round(y_iter, 2),
        "pipeline_efficientdet512_stage_ips": round(e_stage, 2),
        "pipeline_efficientdet512_iter_ips": round(e_iter, 2),
        "pipeline_efficientdet512_devaug_iter_ips": round(e_dev_iter, 2),
        "pipeline_synth_yolov4_608_train_ips": round(y_synth, 2),
        "pipeline_fed_yolov4_608_train_ips": round(y_fed, 2),
        "pipeline_cached_fed_yolov4_608_train_ips": round(y_cached_fed, 2),
        "pipeline_synth_d0_512_train_ips": round(e_synth, 2),
        "pipeline_fed_d0_512_train_ips": round(e_fed, 2),
        "pipeline_fed_d0_512_devaug_train_ips": round(e_dev_fed, 2),
        "pipeline_cached_fed_d0_512_train_ips": round(e_cached_fed, 2),
        "pipeline_bench_platform": jax.default_backend(),
        "pipeline_bench_host_cpus": os.cpu_count(),
    }
    print(json.dumps(results))
    from tools._prov import update_measured
    update_measured(results)


if __name__ == "__main__":
    main()
