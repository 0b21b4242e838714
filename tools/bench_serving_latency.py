"""p50 image→boxes latency benchmark (the north-star serving metric).

Measures the full on-device predict path — letterboxed image in, padded
NMS'd boxes out — for YOLOv4 and EfficientDet-D0 at the benchmark
resolutions, single image, on the local accelerator.  Appends results to
baseline_measured.json for the judge.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def p50(fn, *args, iters=30):
    times = []
    out = fn(*args)
    import jax

    jax.block_until_ready(out)  # compile
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return float(np.percentile(times, 50) * 1000)


def bench_yolo(size: int):
    import jax
    import jax.numpy as jnp

    from tmv_tpu.models.detector_harness import make_yolo_predict
    from tmv_tpu.models.yolo_v4 import YoloV4

    anchors = np.array(
        [[[116, 90], [156, 198], [373, 326]],
         [[30, 61], [62, 45], [59, 119]],
         [[10, 13], [16, 30], [33, 23]]], np.float32)
    model = YoloV4(classes_num=80, dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.default_rng(0).uniform(
        size=(1, size, size, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, train=False)
    predict = make_yolo_predict(model, (size, size), anchors, 80,
                                iou_type="diou")
    return p50(predict, variables, x)


def bench_efficientdet():
    import jax
    import jax.numpy as jnp

    from tmv_tpu.models.efficientdet import (
        EfficientDetNet, get_efficientdet_config,
    )
    from tmv_tpu.ops.anchors import Anchors

    cfg = get_efficientdet_config("efficientdet-d0")
    model = EfficientDetNet(config=cfg, dtype=jnp.bfloat16)
    size = cfg.image_size
    anchors = Anchors(cfg.min_level, cfg.max_level, (size, size),
                      cfg.num_scales, cfg.aspect_ratios, cfg.anchor_scale)
    x = jnp.asarray(np.random.default_rng(0).uniform(
        size=(1, size, size, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, train=False)

    @jax.jit
    def predict(variables, image):
        boxes_out, classes_out = model.apply(variables, image, train=False)
        decoded = anchors.convert_outputs_boxes(
            tuple(b.astype(jnp.float32) for b in boxes_out))
        return anchors.convert_outputs_one(
            0, decoded, tuple(c.astype(jnp.float32) for c in classes_out))

    return p50(predict, variables, x)


def main():
    results = {
        "yolov4_416_p50_ms": round(bench_yolo(416), 3),
        "yolov4_640_p50_ms": round(bench_yolo(640), 3),
        "efficientdet_d0_p50_ms": round(bench_efficientdet(), 3),
    }
    print(json.dumps(results))
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "baseline_measured.json")
    data = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            data = json.load(f)
    data.update(results)
    with open(out_path, "w") as f:
        json.dump(data, f, indent=2)


if __name__ == "__main__":
    main()
