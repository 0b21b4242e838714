"""YOLOv4 inference: dynamic-int8 conv path vs bf16, on the real TPU.

Slope-method per-iter times (see bench.py) for the full forward at
@416/b16 and @640/b16, plus head-output drift between the paths.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

K_SMALL, K_LARGE = 1, 9


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


def bench(size=416, batch=16):
    import jax
    import jax.numpy as jnp

    from tmv_tpu.models.yolo_v4 import YoloV4
    from tmv_tpu.quant import quantized

    rng = np.random.default_rng(0)
    model = YoloV4(classes_num=80, dtype=jnp.bfloat16)
    v = model.init(jax.random.key(0),
                   jnp.zeros((1, size, size, 3)), train=False)
    x = jnp.asarray(
        rng.uniform(size=(batch, size, size, 3)).astype(np.float32))

    def fwd_plain(vv, a):
        heads = model.apply(vv, a, train=False)
        return sum(jnp.sum(h.astype(jnp.float32)) for h in heads)

    with quantized():
        # trace-time flag: build the quantized fn inside the context
        def fwd_q(vv, a):
            heads = model.apply(vv, a, train=False)
            return sum(jnp.sum(h.astype(jnp.float32)) for h in heads)

        @jax.jit
        def chain_q(vv, a, k):
            def body(i, carry):
                s = fwd_q(vv, carry)
                return carry + (s * 1e-12).astype(carry.dtype)
            return jnp.sum(
                jax.lax.fori_loop(0, k, body, a).astype(jnp.float32))
        _ = chain_q.lower(v, x, 1)  # force trace under the flag

    @jax.jit
    def chain_p(vv, a, k):
        def body(i, carry):
            s = fwd_plain(vv, carry)
            return carry + (s * 1e-12).astype(carry.dtype)
        return jnp.sum(
            jax.lax.fori_loop(0, k, body, a).astype(jnp.float32))

    t_p = slope_time(lambda k: np.asarray(chain_p(v, x, k)))
    t_q = slope_time(lambda k: np.asarray(chain_q(v, x, k)))

    # drift of decoded head outputs
    ref = model.apply(v, x[:1], train=False)
    with quantized():
        out = jax.jit(lambda vv, a: model.apply(vv, a, train=False))(v, x[:1])
    drift = max(
        float(np.max(np.abs(np.asarray(a, np.float32)
                            - np.asarray(b, np.float32)))
              / (np.max(np.abs(np.asarray(a, np.float32))) + 1e-9))
        for a, b in zip(ref, out))

    print(f"YOLOv4 @{size} b{batch}: bf16 {t_p*1e3:7.2f} ms "
          f"({batch/t_p:.0f} img/s)  int8 {t_q*1e3:7.2f} ms "
          f"({batch/t_q:.0f} img/s)  speedup {t_p/t_q:.2f}x  "
          f"head-drift {drift:.3f}")


if __name__ == "__main__":
    bench(416)
    bench(640)
