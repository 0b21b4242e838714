"""A/B the fused_dw_eval="auto" routing vs plain XLA across batch sizes.

Round-4 lesson (VERDICT r4 weak #1): the auto predicate routed the Pallas
stem kernel by shape alone, measured only at b32 — and lost 1.5x at the
bench's b64.  This probe sweeps the full EfficientDet-D0 eval forward over
b∈{1,8,32,64} (slope method) so the win region is pinned per batch, and
writes a per-batch table into baseline_measured.json:

    fused_auto_d0_eval_b{N}_base_ms / _auto_ms / _speedup

plus the legacy single-batch keys for the largest swept batch.  Any batch
whose speedup is < 1.0 while the auto predicate engages it is a routing
bug — the table is the evidence the predicate's FUSED_DW_AUTO_MAX_BATCH
gate must match.
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

# Measurement lesson (r5, tools/probe_b1_serving_fused.py): a single
# (1, K) pair is not trustworthy through the tunnel — K=65 once measured
# a 0.14 ms b1 full-model forward (truth: 0.78 ms, 5.5x off).  Every
# number here is now the mean of two *independent* K scales, and the
# disagreement between them is reported as linearity error; per-batch K
# is sized so the slope basis (iter_ms x K) is ~hundreds of ms.
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _pair_slope(run, k_small, k_large, reps=3):
    for k in (k_small, k_large):
        _ = run(k)  # warm
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


def slope_time(run, batch):
    """(mean_s, linearity_err_pct) from two independent K scales."""
    k1, k2 = (129, 257) if batch <= 8 else (33, 65)
    a = _pair_slope(run, 1, k1)
    b = _pair_slope(run, 1, k2)
    mean = (a + b) / 2
    return mean, abs(a - b) / mean * 100


def build_models(size):
    import jax.numpy as jnp

    from tmv_tpu.core.config import Config
    from tmv_tpu.models.efficientdet import (
        EfficientDetNet, get_efficientdet_config,
    )

    cfg = get_efficientdet_config("efficientdet-d0")
    cfg.image_size = size
    cfg.levels_size = [size]
    for _ in range(cfg.max_level):
        cfg.levels_size.append((cfg.levels_size[-1] + 1) // 2)
    cfg2 = Config(cfg.as_dict())
    cfg2.fused_dw_eval = "auto"
    base = EfficientDetNet(config=cfg, dtype=jnp.bfloat16)
    auto = EfficientDetNet(config=cfg2, dtype=jnp.bfloat16)
    return base, auto


def model_chain(model, variables, xs):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(v, a, kk):
        # kk is traced: one compile serves every K scale
        def body(i, carry):
            boxes, classes = model.apply(v, carry, train=False)
            s = sum(jnp.sum(o.astype(jnp.float32))
                    for o in list(boxes) + list(classes))
            return carry + (s * 1e-12).astype(carry.dtype)
        o = jax.lax.fori_loop(0, kk, body, a)
        return jnp.sum(o.astype(jnp.float32))
    return lambda kk: np.asarray(run(variables, xs, kk))


def main(batches=(1, 8, 32, 64), size=512):
    import jax
    import jax.numpy as jnp

    from tmv_tpu.models.efficientdet.backbone import FUSED_DW_AUTO_MAX_BATCH

    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}  b{list(batches)} @{size} bf16  "
          f"auto max batch: {FUSED_DW_AUTO_MAX_BATCH}")

    base, auto = build_models(size)
    variables = base.init(jax.random.key(0),
                          jnp.zeros((1, size, size, 3)), train=False)

    out = {}
    for batch in batches:
        xs = jnp.asarray(rng.uniform(size=(batch, size, size, 3))
                         .astype(np.float32))
        t_b, lin_b = slope_time(model_chain(base, variables, xs), batch)
        t_a, lin_a = slope_time(model_chain(auto, variables, xs), batch)
        engaged = batch <= FUSED_DW_AUTO_MAX_BATCH
        print(f"b{batch:3d}: base {t_b*1e3:8.3f} ms ({batch/t_b:7.0f} img/s)"
              f"   auto {t_a*1e3:8.3f} ms ({batch/t_a:7.0f} img/s)"
              f"   ({t_b/t_a:4.2f}x, kernel {'ON' if engaged else 'off'}, "
              f"linerr {max(lin_b, lin_a):.1f}%)")
        out[f"fused_auto_d0_eval_b{batch}_base_ms"] = round(t_b * 1e3, 3)
        out[f"fused_auto_d0_eval_b{batch}_auto_ms"] = round(t_a * 1e3, 3)
        out[f"fused_auto_d0_eval_b{batch}_speedup"] = round(t_b / t_a, 3)
        out[f"fused_auto_d0_eval_b{batch}_linerr_pct"] = round(
            max(lin_b, lin_a), 1)
        if engaged and t_b / t_a < 0.99:
            print(f"  WARNING: auto engages the kernel at b{batch} but "
                  f"loses {t_b/t_a:.2f}x — lower FUSED_DW_AUTO_MAX_BATCH")

    # legacy single-batch keys = the largest swept batch (bench shape)
    big = max(batches)
    out["fused_auto_d0_eval_base_ms"] = out[f"fused_auto_d0_eval_b{big}_base_ms"]
    out["fused_auto_d0_eval_auto_ms"] = out[f"fused_auto_d0_eval_b{big}_auto_ms"]
    out["fused_auto_d0_eval_speedup"] = out[f"fused_auto_d0_eval_b{big}_speedup"]
    out["fused_auto_max_batch"] = FUSED_DW_AUTO_MAX_BATCH

    # device numerics spot-check on the same variables (b2 → XLA path on
    # both models; the kernel path's own numerics live in the b1 predict
    # parity of tests/test_dwconv_pallas.py)
    small = jnp.asarray(rng.uniform(size=(2, size, size, 3))
                        .astype(np.float32))
    ra = np.asarray(jax.jit(lambda v, a: base.apply(v, a, train=False)[0][0])(
        variables, small), np.float32)
    rb = np.asarray(jax.jit(lambda v, a: auto.apply(v, a, train=False)[0][0])(
        variables, small), np.float32)
    drift = float(np.max(np.abs(ra - rb)) / (np.max(np.abs(ra)) + 1e-9))
    print(f"rel head drift: {drift:.2e}")
    out["fused_auto_d0_head_rel_drift"] = round(drift, 6)

    from tools._prov import update_measured
    update_measured(out)
    print(json.dumps(out))


if __name__ == "__main__":
    bs = tuple(int(b) for b in sys.argv[1].split(",")) if len(sys.argv) > 1 \
        else (1, 8, 32, 64)
    main(bs, int(sys.argv[2]) if len(sys.argv) > 2 else 512)
