"""Benchmark: EfficientDet-D0 inference throughput on the local accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measurement method: the dev-harness 'axon' backend neither honors
``block_until_ready`` as a completion barrier nor keeps per-call dispatch
cheap (~30 ms RPC floor), so naive wall-clock loops report impossible
numbers (calibrated: an 8192³ bf16 matmul shows 172 TFLOP/s ≈ 87% of v5e
peak only when measured this way).  We therefore time *chained* forwards —
k data-dependent model applications inside one jit, result fetched to host
— for two values of k and report the slope, which cancels the RPC constant
and measures pure device throughput.

The TF2-CPU denominator comes from ``tools/measure_tf_cpu_baseline.py``
(cached in baseline_measured.json).
"""

import json
import os
import time
from functools import partial

import numpy as np

BATCH = 64
K_SMALL, K_LARGE = 1, 5
BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "baseline_measured.json")
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
    x0 = jnp.asarray(
        rng.uniform(size=(BATCH, size, size, 3)).astype(np.float32))

    @partial(jax.jit, static_argnums=2)
    def fwd_chain(v, x, k):
        # data dependency between iterations defeats dispatch pipelining /
        # result elision; the epsilon feedback does not change the FLOPs
        def body(i, carry):
            boxes, _classes = model.apply(v, carry, train=False)
            s = sum(jnp.sum(b.astype(jnp.float32)) for b in boxes)
            return carry + (s * 1e-12).astype(carry.dtype)
        out = jax.lax.fori_loop(0, k, body, x)
        return jnp.sum(out.astype(jnp.float32))

    def timed(k, reps=3):
        _ = np.asarray(fwd_chain(variables, x0, k))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = np.asarray(fwd_chain(variables, x0, k))
            best = min(best, time.perf_counter() - t0)
        return best

    t_small = timed(K_SMALL)
    t_large = timed(K_LARGE)
    per_fwd = (t_large - t_small) / (K_LARGE - K_SMALL)
    ips = BATCH / per_fwd

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
