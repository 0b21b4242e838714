"""Resolve the b1 fused-dw contradiction with one controlled experiment.

After r5's K_LARGE=65 re-probe, baseline_measured.json carries two numbers
that cannot both be right:

- ``fused_auto_d0_eval_b1_base_ms = 0.14`` vs ``_auto_ms = 1.48`` — the
  raw b1 forward claims the Pallas stem kernel is a 10x LOSS at b1, while
- ``serving_p50_device_d0_512_ms`` improved 2.115 -> 1.553 when the kernel
  engaged (BENCH_r04 p50 path) — the full b1 image->boxes path claims a
  1.36x WIN.

The raw forward is a strict subset of the predict path, so one of the two
measurements is wrong.  This probe measures BOTH programs at b1, for BOTH
backends (fused off / auto), each at two independent K pairs — (1,129) and
(1,257) — so non-linearity exposes a broken measurement instead of
silently electing one.

Writes serving_b1_d0_{fwd,predict}_{xla,fused}_ms (and a linearity error
pct) into baseline_measured.json via tools/_prov.
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def pair_slope(run, k_small, k_large, reps=3):
    for k in (k_small, k_large):
        _ = run(k)  # warm / compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = run(k_small)
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = run(k_large)
        t_l = time.perf_counter() - t0
        best = min(best, (t_l - t_s) / (k_large - k_small))
    return best


def two_scale(run):
    """Slope at two K scales; returns (mean_s, linearity_err_pct)."""
    a = pair_slope(run, 1, 129)
    b = pair_slope(run, 1, 257)
    mean = (a + b) / 2
    return mean, abs(a - b) / mean * 100


def build(size=512):
    import jax
    import jax.numpy as jnp

    from tmv_tpu.core.config import Config
    from tmv_tpu.models.efficientdet import (
        EfficientDetNet, get_efficientdet_config,
    )
    from tmv_tpu.models.efficientdet.harness import make_efficientdet_predict
    from tmv_tpu.ops.anchors import Anchors

    cfg = get_efficientdet_config("efficientdet-d0")
    cfg.image_size = size
    cfg.levels_size = [size]
    for _ in range(cfg.max_level):
        cfg.levels_size.append((cfg.levels_size[-1] + 1) // 2)
    cfg_off = Config(cfg.as_dict())
    cfg_off.fused_dw_eval = False
    cfg_auto = Config(cfg.as_dict())
    cfg_auto.fused_dw_eval = "auto"
    anchors = Anchors(cfg.min_level, cfg.max_level, (size, size),
                      cfg.num_scales, cfg.aspect_ratios, cfg.anchor_scale)

    models = {"xla": EfficientDetNet(config=cfg_off, dtype=jnp.bfloat16),
              "fused": EfficientDetNet(config=cfg_auto, dtype=jnp.bfloat16)}
    variables = models["xla"].init(
        jax.random.key(0), jnp.zeros((1, size, size, 3)), train=False)
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.uniform(size=(1, size, size, 3)).astype(np.float32))

    runs = {}
    for name, model in models.items():
        @partial(jax.jit, static_argnums=2)
        def fwd_chain(v, x, k, model=model):
            def body(i, carry):
                boxes, classes = model.apply(v, carry, train=False)
                s = sum(jnp.sum(o.astype(jnp.float32))
                        for o in list(boxes) + list(classes))
                return carry + (s * 1e-12).astype(carry.dtype)
            return jnp.sum(jax.lax.fori_loop(0, k, body, x)
                           .astype(jnp.float32))

        predict = make_efficientdet_predict(model, anchors, size)

        @partial(jax.jit, static_argnums=2)
        def pred_chain(v, x, k, predict=predict):
            def body(i, carry):
                boxes, ids, scores, valid = predict(v, carry)
                s = (jnp.sum(boxes.astype(jnp.float32))
                     + jnp.sum(scores.astype(jnp.float32)))
                return carry + (s * 1e-12).astype(carry.dtype)
            return jnp.sum(jax.lax.fori_loop(0, k, body, x)
                           .astype(jnp.float32))

        runs[f"fwd_{name}"] = (
            lambda k, f=fwd_chain: np.asarray(f(variables, x1, k)))
        runs[f"predict_{name}"] = (
            lambda k, f=pred_chain: np.asarray(f(variables, x1, k)))
    return runs


def main():
    import jax
    print(f"devices: {jax.devices()}  D0@512 b1, K pairs (1,129)/(1,257)")
    runs = build()
    out = {}
    for name, run in runs.items():
        ms, lin = two_scale(run)
        ms *= 1e3
        print(f"{name:16s}: {ms:7.3f} ms/iter  (linearity err {lin:4.1f}%)")
        out[f"serving_b1_d0_{name}_ms"] = round(ms, 3)
        out[f"serving_b1_d0_{name}_linerr_pct"] = round(lin, 1)
    for prog in ("fwd", "predict"):
        out[f"serving_b1_d0_{prog}_fused_speedup"] = round(
            out[f"serving_b1_d0_{prog}_xla_ms"]
            / out[f"serving_b1_d0_{prog}_fused_ms"], 3)
    print(json.dumps(out))
    from tools._prov import update_measured
    update_measured(out)


if __name__ == "__main__":
    main()
