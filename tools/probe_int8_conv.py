"""Does int8 convolution actually hit the fast MXU path on this TPU?

v5e peak is ~394 int8 TOPS vs ~197 bf16 TFLOP/s.  Before building a
quantized serving path, measure whether XLA lowers int8
``conv_general_dilated`` (int32 accumulation) at a speed that justifies
it.  Slope-method timing (see bench.py).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

K_SMALL, K_LARGE = 1, 33


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


def probe(batch=32, hw=64, cin=256, cout=256, k=3):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x8 = jnp.asarray(rng.integers(-127, 127, (batch, hw, hw, cin), np.int8))
    w8 = jnp.asarray(rng.integers(-127, 127, (k, k, cin, cout), np.int8))
    xb = x8.astype(jnp.bfloat16)
    wb = w8.astype(jnp.bfloat16)
    dn = jax.lax.conv_dimension_numbers(x8.shape, w8.shape,
                                        ("NHWC", "HWIO", "NHWC"))

    def chain(conv, x0):
        @jax.jit
        def run(x, w, kk):
            def body(i, carry):
                s = conv(carry, w)
                # renormalize so the int8 carry stays in range
                return (carry
                        + (s.astype(jnp.float32).sum() * 1e-30)
                        .astype(carry.dtype))
            out = jax.lax.fori_loop(0, kk, body, x)
            return jnp.sum(out.astype(jnp.float32))
        return lambda kk: np.asarray(run(x0, w8 if x0.dtype == jnp.int8
                                         else wb, kk))

    def conv_i8(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32)

    def conv_bf(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.float32)

    flops = 2 * batch * hw * hw * cin * cout * k * k
    t_bf = slope_time(chain(conv_bf, xb))
    t_i8 = slope_time(chain(conv_i8, x8))
    print(f"conv {batch}x{hw}²x{cin}->{cout} k{k}:")
    print(f"  bf16: {t_bf*1e3:7.3f} ms  {flops/t_bf/1e12:6.1f} TFLOP/s")
    print(f"  int8: {t_i8*1e3:7.3f} ms  {flops/t_i8/1e12:6.1f} TOP/s "
          f" ({t_bf/t_i8:.2f}x vs bf16)")


if __name__ == "__main__":
    probe()
    probe(hw=32, cin=512, cout=512)
    probe(hw=16, cin=1024, cout=1024)
