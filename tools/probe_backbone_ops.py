"""Which op class inside the EfficientNet-B0 @512 backbone eats the time?

Times chains of the *individual* op classes at the real block shapes —
expand 1×1 convs, depthwise k×k convs, SE gates, project 1×1 convs,
BN+swish elementwise — each standalone (so no cross-op fusion), plus each
op's HBM bandwidth floor, to find where the measured 19 ms/iter (b32) of
the full backbone goes and what a fused Pallas kernel could recover.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

K_SMALL, K_LARGE = 1, 9
HBM_GBS = 819e9  # v5e


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


# B0 @512, batch dims: (hw_in, cin, cexp, cout, k, stride, repeats)
BLOCKS = [
    (256, 32, 32, 16, 3, 1, 1),
    (256, 16, 96, 24, 3, 2, 1), (128, 24, 144, 24, 3, 1, 1),
    (128, 24, 144, 40, 5, 2, 1), (64, 40, 240, 40, 5, 1, 1),
    (64, 40, 240, 80, 3, 2, 1), (32, 80, 480, 80, 3, 1, 2),
    (32, 80, 480, 112, 5, 1, 1), (32, 112, 672, 112, 5, 1, 2),
    (32, 112, 672, 192, 5, 2, 1), (16, 192, 1152, 192, 5, 1, 3),
    (16, 192, 1152, 320, 3, 1, 1),
]
BATCH = 32


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    dn = lambda xs, ws: jax.lax.conv_dimension_numbers(
        xs, ws, ("NHWC", "HWIO", "NHWC"))

    def timed_chain(fn, x0, extra):
        @jax.jit
        def run(x, e, kk):
            def body(i, carry):
                s = fn(carry, e)
                return carry + (jnp.sum(s.astype(jnp.float32)) * 1e-12
                                ).astype(carry.dtype)
            out = jax.lax.fori_loop(0, kk, body, x)
            return jnp.sum(out.astype(jnp.float32))
        return lambda kk: np.asarray(run(x0, extra, kk))

    groups = {"expand": 0.0, "dw": 0.0, "se": 0.0, "project": 0.0}
    floors = {k: 0.0 for k in groups}

    for (hw, cin, cexp, cout, k, stride, reps) in BLOCKS:
        hw_out = hw // stride
        bpe = 2  # bf16

        if cexp != cin:
            x = jnp.asarray(rng.normal(size=(BATCH, hw, hw, cin))
                            .astype(np.float32), jnp.bfloat16)
            w = jnp.asarray(rng.normal(size=(1, 1, cin, cexp))
                            .astype(np.float32), jnp.bfloat16)
            f = lambda a, ww: jax.lax.conv_general_dilated(
                a, ww, (1, 1), "SAME",
                dimension_numbers=dn(a.shape, ww.shape),
                preferred_element_type=jnp.bfloat16)
            groups["expand"] += reps * slope_time(timed_chain(f, x, w))
            floors["expand"] += reps * BATCH * hw * hw * (cin + cexp) \
                * bpe / HBM_GBS

        xd = jnp.asarray(rng.normal(size=(BATCH, hw, hw, cexp))
                         .astype(np.float32), jnp.bfloat16)
        wd = jnp.asarray(rng.normal(size=(k, k, 1, cexp))
                         .astype(np.float32), jnp.bfloat16)

        def fdw(a, ww, s=stride, ch=cexp):
            return jax.lax.conv_general_dilated(
                a, ww, (s, s), "SAME",
                dimension_numbers=dn(a.shape, ww.shape),
                feature_group_count=ch,
                preferred_element_type=jnp.bfloat16)

        # stride>1 shrinks the carry; time stride-1 at in-res as the proxy
        fdw1 = lambda a, ww: fdw(a, ww, 1)
        groups["dw"] += reps * slope_time(timed_chain(fdw1, xd, wd))
        floors["dw"] += reps * BATCH * hw * hw * cexp * 2 * bpe / HBM_GBS

        xs = jnp.asarray(rng.normal(size=(BATCH, hw_out, hw_out, cexp))
                         .astype(np.float32), jnp.bfloat16)
        nr = max(1, int(cin * 0.25))
        w1 = jnp.asarray(rng.normal(size=(1, 1, cexp, nr))
                         .astype(np.float32), jnp.bfloat16)
        w2 = jnp.asarray(rng.normal(size=(1, 1, nr, cexp))
                         .astype(np.float32), jnp.bfloat16)

        def fse(a, ws):
            wa, wb = ws
            se = jnp.mean(a, axis=(1, 2), keepdims=True)
            se = jax.lax.conv_general_dilated(
                se, wa, (1, 1), "SAME",
                dimension_numbers=dn(se.shape, wa.shape),
                preferred_element_type=jnp.bfloat16)
            se = jax.nn.swish(se)
            se = jax.lax.conv_general_dilated(
                se, wb, (1, 1), "SAME",
                dimension_numbers=dn(se.shape, wb.shape),
                preferred_element_type=jnp.bfloat16)
            return jax.nn.sigmoid(se) * a
        groups["se"] += reps * slope_time(timed_chain(fse, xs, (w1, w2)))
        floors["se"] += reps * BATCH * hw_out * hw_out * cexp * 3 \
            * bpe / HBM_GBS

        wp = jnp.asarray(rng.normal(size=(1, 1, cexp, cout))
                         .astype(np.float32), jnp.bfloat16)
        fp = lambda a, ww: jax.lax.conv_general_dilated(
            a, ww, (1, 1), "SAME",
            dimension_numbers=dn(a.shape, ww.shape),
            preferred_element_type=jnp.bfloat16)
        groups["project"] += reps * slope_time(timed_chain(fp, xs, wp))
        floors["project"] += reps * BATCH * hw_out * hw_out \
            * (cexp + cout) * bpe / HBM_GBS

    total = sum(groups.values())
    print(f"B0 @512 b{BATCH} bf16 — standalone op-class totals "
          f"(ms/iter, vs HBM floor):")
    for g in groups:
        print(f"  {g:8s} {groups[g]*1e3:7.2f} ms   floor "
              f"{floors[g]*1e3:6.2f} ms   ({groups[g]/max(floors[g],1e-9):4.1f}x)")
    print(f"  sum      {total*1e3:7.2f} ms   (full backbone measured "
          f"separately ≈ 19 ms)")


if __name__ == "__main__":
    main()
