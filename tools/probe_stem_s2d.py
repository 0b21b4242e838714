"""A/B the space-to-depth stem (round-4 depthwise-wall item).

Measures, slope-method (see bench.py / CLAUDE.md — axon's
``block_until_ready`` is not a completion barrier), b32 bf16:

  1. stem-only: reference 3x3/s2 conv+BN+swish at 512²x3 vs the exact
     s2d(2)+2x2/s1 re-expression (`ops/space_to_depth.py`)
  2. full D0 @512 eval forward: stem_s2d off vs on
  3. full D0 @512 train step proxy (fwd+bwd on the box/class L2): off vs on

Appends ``stem_s2d_*`` keys to baseline_measured.json, win or lose.
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
    from jax import lax

    from tmv_tpu.core.config import Config
    from tmv_tpu.models.efficientdet import (
        EfficientDetNet, get_efficientdet_config,
    )
    from tmv_tpu.ops.space_to_depth import (
        space_to_depth, stem_kernel_to_s2d,
    )

    rng = np.random.default_rng(0)
    out = {}
    print(f"devices: {jax.devices()}  b{batch} @{size} bf16")

    # ---- 1. stem-only --------------------------------------------------
    x = jnp.asarray(rng.uniform(size=(batch, size, size, 3))
                    .astype(np.float32), jnp.bfloat16)
    w3 = jnp.asarray(rng.normal(size=(3, 3, 3, 32)).astype(np.float32) * .1,
                     jnp.bfloat16)
    scale = jnp.asarray(rng.uniform(.5, 1.5, (32,)).astype(np.float32))
    offset = jnp.asarray(rng.normal(size=(32,)).astype(np.float32) * .1)

    def stem_base(a):
        y = lax.conv_general_dilated(
            a, w3, (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jax.nn.swish(y * scale.astype(y.dtype)
                            + offset.astype(y.dtype))

    def stem_s2d(a):
        y = lax.conv_general_dilated(
            space_to_depth(a, 2), stem_kernel_to_s2d(w3), (1, 1),
            [(0, 1), (0, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jax.nn.swish(y * scale.astype(y.dtype)
                            + offset.astype(y.dtype))

    def chain(fn):
        @partial(jax.jit, static_argnums=1)
        def run(a, kk):
            def body(i, carry):
                o = fn(carry)
                # data-dependent feedback at the input shape
                s = jnp.sum(o.astype(jnp.float32)) * 1e-12
                return carry + s.astype(carry.dtype)
            o = jax.lax.fori_loop(0, kk, body, a)
            return jnp.sum(o.astype(jnp.float32))
        return lambda kk: np.asarray(run(x, kk))

    t_base = slope_time(chain(stem_base))
    t_s2d = slope_time(chain(stem_s2d))
    print(f"stem-only:  base {t_base*1e3:7.3f} ms   "
          f"s2d {t_s2d*1e3:7.3f} ms   ({t_base/t_s2d:4.2f}x)")
    out["stem_s2d_stemonly_base_ms"] = round(t_base * 1e3, 3)
    out["stem_s2d_stemonly_s2d_ms"] = round(t_s2d * 1e3, 3)

    # ---- 2. full D0 eval forward ---------------------------------------
    cfg = get_efficientdet_config("efficientdet-d0")
    assert cfg.image_size == size or True
    cfg.image_size = size
    cfg.levels_size = [size]
    for _ in range(cfg.max_level):
        cfg.levels_size.append((cfg.levels_size[-1] + 1) // 2)
    cfg2 = Config(cfg.as_dict())
    cfg2.stem_s2d = True
    base = EfficientDetNet(config=cfg, dtype=jnp.bfloat16)
    s2d = EfficientDetNet(config=cfg2, dtype=jnp.bfloat16)

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
    t_s = slope_time(model_chain(s2d))
    print(f"D0 eval:    base {t_b*1e3:7.3f} ms ({batch/t_b:.0f} img/s)   "
          f"s2d {t_s*1e3:7.3f} ms ({batch/t_s:.0f} img/s)   "
          f"({t_b/t_s:4.2f}x)")
    out["stem_s2d_d0_eval_base_ms"] = round(t_b * 1e3, 3)
    out["stem_s2d_d0_eval_s2d_ms"] = round(t_s * 1e3, 3)
    out["stem_s2d_d0_eval_speedup"] = round(t_b / t_s, 3)

    # ---- 3. train-step proxy (fwd+bwd+sgd on L2 of outputs) ------------
    def train_chain(model):
        def loss(p, bs, a):
            out2, new = model.apply(
                {"params": p, "batch_stats": bs}, a, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.key(0)})
            boxes, classes = out2
            l = sum(jnp.sum(jnp.square(o.astype(jnp.float32)))
                    for o in list(boxes) + list(classes))
            return l * 1e-9, new["batch_stats"]

        @partial(jax.jit, static_argnums=2)
        def run(v, a, kk):
            def body(carry, _):
                p, bs = carry
                (l, bs2), g = jax.value_and_grad(loss, has_aux=True)(
                    p, bs, a)
                p2 = jax.tree.map(lambda w, gw: w - 1e-9 * gw, p, g)
                return (p2, bs2), l
            (p, bs), ls = jax.lax.scan(
                body, (v["params"], v["batch_stats"]), None, length=kk)
            return jnp.sum(ls)
        return lambda kk: np.asarray(run(variables, xs, kk))

    t_tb = slope_time(train_chain(base), reps=2)
    t_ts = slope_time(train_chain(s2d), reps=2)
    print(f"D0 train:   base {t_tb*1e3:7.3f} ms ({batch/t_tb:.0f} img/s)   "
          f"s2d {t_ts*1e3:7.3f} ms ({batch/t_ts:.0f} img/s)   "
          f"({t_tb/t_ts:4.2f}x)")
    out["stem_s2d_d0_train_base_ms"] = round(t_tb * 1e3, 3)
    out["stem_s2d_d0_train_s2d_ms"] = round(t_ts * 1e3, 3)
    out["stem_s2d_d0_train_speedup"] = round(t_tb / t_ts, 3)

    path = os.path.join(ROOT, "baseline_measured.json")
    from tools._prov import update_measured
    update_measured(out)
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32,
         int(sys.argv[2]) if len(sys.argv) > 2 else 512)
