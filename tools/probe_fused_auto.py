"""A/B: fused_dw_eval="auto" (Pallas dw only on the 256-spatial stem-block
shape) vs plain XLA, full EfficientDet-D0 @512 eval forward, slope method.

Appends ``fused_auto_*`` keys to baseline_measured.json, win or lose.
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

K_SMALL, K_LARGE = 1, 9
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def slope_time(run, reps=3):
    times = {}
    for k in (K_SMALL, K_LARGE):
        _ = run(k)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = run(k)
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    return (times[K_LARGE] - times[K_SMALL]) / (K_LARGE - K_SMALL)


def main(batch=32, size=512):
    import jax
    import jax.numpy as jnp

    from tmv_tpu.core.config import Config
    from tmv_tpu.models.efficientdet import (
        EfficientDetNet, get_efficientdet_config,
    )

    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}  b{batch} @{size} bf16")

    cfg = get_efficientdet_config("efficientdet-d0")
    cfg.image_size = size
    cfg.levels_size = [size]
    for _ in range(cfg.max_level):
        cfg.levels_size.append((cfg.levels_size[-1] + 1) // 2)
    cfg2 = Config(cfg.as_dict())
    cfg2.fused_dw_eval = "auto"
    base = EfficientDetNet(config=cfg, dtype=jnp.bfloat16)
    auto = EfficientDetNet(config=cfg2, dtype=jnp.bfloat16)

    xs = jnp.asarray(rng.uniform(size=(batch, size, size, 3))
                     .astype(np.float32))
    variables = base.init(jax.random.key(0),
                          jnp.zeros((1, size, size, 3)), train=False)

    def model_chain(model):
        @partial(jax.jit, static_argnums=2)
        def run(v, a, kk):
            def body(i, carry):
                boxes, classes = model.apply(v, carry, train=False)
                s = sum(jnp.sum(o.astype(jnp.float32))
                        for o in list(boxes) + list(classes))
                return carry + (s * 1e-12).astype(carry.dtype)
            o = jax.lax.fori_loop(0, kk, body, a)
            return jnp.sum(o.astype(jnp.float32))
        return lambda kk: np.asarray(run(variables, xs, kk))

    t_b = slope_time(model_chain(base))
    t_a = slope_time(model_chain(auto))
    print(f"D0 eval: base {t_b*1e3:7.3f} ms ({batch/t_b:.0f} img/s)   "
          f"auto {t_a*1e3:7.3f} ms ({batch/t_a:.0f} img/s)   "
          f"({t_b/t_a:4.2f}x)")

    # device numerics spot-check on the same variables
    small = xs[:2]
    ra = np.asarray(jax.jit(lambda v, a: base.apply(v, a, train=False)[0][0])(
        variables, small), np.float32)
    rb = np.asarray(jax.jit(lambda v, a: auto.apply(v, a, train=False)[0][0])(
        variables, small), np.float32)
    drift = float(np.max(np.abs(ra - rb)) / (np.max(np.abs(ra)) + 1e-9))
    print(f"rel head drift: {drift:.2e}")

    out = {
        "fused_auto_d0_eval_base_ms": round(t_b * 1e3, 3),
        "fused_auto_d0_eval_auto_ms": round(t_a * 1e3, 3),
        "fused_auto_d0_eval_speedup": round(t_b / t_a, 3),
        "fused_auto_d0_head_rel_drift": round(drift, 6),
    }
    path = os.path.join(ROOT, "baseline_measured.json")
    data = json.load(open(path)) if os.path.exists(path) else {}
    data.update(out)
    with open(path, "w") as f:
        json.dump(data, f, indent=2, sort_keys=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32,
         int(sys.argv[2]) if len(sys.argv) > 2 else 512)
