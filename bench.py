"""Benchmark: EfficientDet-D0 inference throughput on the local accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The north-star metric (BASELINE.json) is images/sec/chip for
EfficientDet-D0 @512 vs the TF2-CPU reference.  Measured at batch 64
(single-image dispatch is dominated by the dev-harness tunnel RPC; batch 64
amortizes it and reaches ~50-60% MXU on v5e) over distinct input batches.

The TF2 reference cannot run under this image's TF2.21/Keras3 (legacy
Keras-2 API usage), so the CPU denominator is measured once from an
equivalent-compute Keras graph by ``tools/measure_tf_cpu_baseline.py`` and
cached in ``baseline_measured.json``.
"""

import json
import os
import time

import numpy as np

BATCH = 64
WARMUP = 2
ITERS = 8
BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "baseline_measured.json")
# fallback TF2-CPU denominator (images/sec) until measured
FALLBACK_TF_CPU_IPS = 5.97


def main():
    import jax
    import jax.numpy as jnp

    from tmv_tpu.models.efficientdet import (
        EfficientDetNet, get_efficientdet_config,
    )

    cfg = get_efficientdet_config("efficientdet-d0")
    model = EfficientDetNet(config=cfg, dtype=jnp.bfloat16)
    size = cfg.image_size
    rng = np.random.default_rng(0)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, size, size, 3)), train=False)

    @jax.jit
    def forward(variables, images):
        boxes, classes = model.apply(variables, images, train=False)
        return tuple(jnp.sum(b.astype(jnp.float32)) for b in boxes)

    # distinct inputs per iteration (defeats any transport-level caching)
    xs = [
        jnp.asarray(rng.uniform(size=(BATCH, size, size, 3))
                    .astype(np.float32))
        for _ in range(ITERS)
    ]
    for _ in range(WARMUP):
        out = forward(variables, xs[0])
        jax.block_until_ready(out)

    t0 = time.perf_counter()
    for i in range(ITERS):
        out = forward(variables, xs[i])
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    ips = BATCH * ITERS / dt

    baseline = FALLBACK_TF_CPU_IPS
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            baseline = json.load(f).get("efficientdet_d0_tf_cpu_ips", baseline)

    print(json.dumps({
        "metric": "efficientdet_d0_infer_images_per_sec_per_chip",
        "value": round(ips, 3),
        "unit": "images/sec",
        "vs_baseline": round(ips / baseline, 3),
    }))


if __name__ == "__main__":
    main()
