"""Can the MXU beat the VPU on EfficientNet's depthwise convs?

The r2 profile (`profile_d0_components.py`) showed depthwise is the
dominant op class in D0 (8.3 of 19 ms backbone, VPU/bandwidth-bound,
~2% MXU).  A depthwise conv is mathematically a dense conv whose kernel
is diagonal in (cin, cout) — or a grouped conv with any group size g
dividing C (kernel block-diagonal).  Re-expressing it costs g× the
FLOPs but moves the work onto the MXU while HBM traffic stays the same,
so on a bandwidth-bound stage the extra FLOPs could be free.

This probe times, per real B0@512 depthwise shape (stride-1 proxy, same
convention as probe_backbone_ops.py):
  dw      — feature_group_count=C (the shipped path)
  g8/g32  — block-diagonal grouped conv, group size 8 / 32
  dense   — full diagonal dense conv (skipped where C makes it absurd)
All bf16, slope-method timing.  Equivalence of the re-expression is a
kernel-embedding identity (checked once numerically on a small shape).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

K_SMALL, K_LARGE = 1, 9
HBM_GBS = 819e9  # v5e
MXU_TFLOPS = 197e12  # v5e bf16

# (hw at dw input, C=cexp, k, native stride, repeats in B0) — from
# probe_backbone_ops.py BLOCKS
DW_SHAPES = [
    (256, 32, 3, 1, 1),
    (256, 96, 3, 2, 1), (128, 144, 3, 1, 1),
    (128, 144, 5, 2, 1), (64, 240, 5, 1, 1),
    (64, 240, 3, 2, 1), (32, 480, 3, 1, 2),
    (32, 480, 5, 1, 1), (32, 672, 5, 1, 2),
    (32, 672, 5, 2, 1), (16, 1152, 5, 1, 3),
    (16, 1152, 3, 1, 1),
]
# --early: only the large-spatial/small-C stages where the FLOP blowup is
# affordable and the dw cost concentrates (remote compiles are ~20s each,
# so the full matrix is slow through the tunnel)
if "--early" in sys.argv:
    DW_SHAPES = DW_SHAPES[:6]
BATCH = 32


def slope_time(run, reps=3):
    times = {}
    for kk in (K_SMALL, K_LARGE):
        _ = run(kk)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = run(kk)
            best = min(best, time.perf_counter() - t0)
        times[kk] = best
    return (times[K_LARGE] - times[K_SMALL]) / (K_LARGE - K_SMALL)


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    dn = lambda xs, ws: jax.lax.conv_dimension_numbers(
        xs, ws, ("NHWC", "HWIO", "NHWC"))

    def timed_chain(fn, x0, w0):
        @jax.jit
        def run(x, w, kk):
            def body(i, carry):
                s = fn(carry, w)
                return carry + (jnp.sum(s.astype(jnp.float32)) * 1e-12
                                ).astype(carry.dtype)
            out = jax.lax.fori_loop(0, kk, body, x)
            return jnp.sum(out.astype(jnp.float32))
        return lambda kk: np.asarray(run(x0, w0, kk))

    def conv(a, w, fgc):
        return jax.lax.conv_general_dilated(
            a, w, (1, 1), "SAME",
            dimension_numbers=dn(a.shape, w.shape),
            feature_group_count=fgc,
            preferred_element_type=jnp.bfloat16)

    # one-time numerical identity check: diag/block embedding == depthwise
    def embed(wdw, g):
        # wdw (k,k,1,C) -> grouped kernel (k,k,g,C) with per-group diagonal
        k_, _, _, C = wdw.shape
        wg = np.zeros((k_, k_, g, C), np.float32)
        for c in range(C):
            wg[:, :, c % g, c] = wdw[:, :, 0, c]
        return wg

    xs = jnp.asarray(rng.normal(size=(2, 16, 16, 32)).astype(np.float32),
                     jnp.bfloat16)
    ws = rng.normal(size=(3, 3, 1, 32)).astype(np.float32)
    ref = conv(xs, jnp.asarray(ws, jnp.bfloat16), 32)
    for g in (8, 32):
        got = conv(xs, jnp.asarray(embed(ws, g), jnp.bfloat16), 32 // g)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                    - got.astype(jnp.float32))))
        assert err < 0.05, (g, err)  # bf16 rounding-order slack
    print("embedding identity ok (g=8, dense)")

    total = {"dw": 0.0, "g8": 0.0, "g32": 0.0, "dense": 0.0,
             "best_mix": 0.0}
    print(f"{'shape':>16s} {'floor':>7s} {'dw':>7s} {'g8':>7s} "
          f"{'g32':>7s} {'dense':>8s}   (ms/iter, b{BATCH} bf16, "
          f"stride-1 proxy)")
    for (hw, C, k, stride, reps) in DW_SHAPES:
        x = jnp.asarray(rng.normal(size=(BATCH, hw, hw, C))
                        .astype(np.float32), jnp.bfloat16)
        floor = BATCH * hw * hw * C * 2 * 2 / HBM_GBS
        row = {}
        for name, g in (("dw", 1), ("g8", 8), ("g32", 32), ("dense", C)):
            if name == "dw":
                fgc, gsz = C, 1
            else:
                gsz = min(g, C)
                if C % gsz:
                    row[name] = float("nan")
                    continue
                fgc = C // gsz
            # estimated MXU time; skip absurd dense cases (>20 ms)
            est = BATCH * hw * hw * k * k * C * gsz * 2 / MXU_TFLOPS
            if est > 0.020:
                row[name] = float("nan")
                continue
            w = jnp.asarray(rng.normal(size=(k, k, gsz, C))
                            .astype(np.float32), jnp.bfloat16)
            f = lambda a, ww, fg=fgc: conv(a, ww, fg)
            row[name] = slope_time(timed_chain(f, x, w))
        best = min(v for v in row.values() if v == v)
        for name in total:
            if name == "best_mix":
                total[name] += reps * best
            elif row.get(name, float("nan")) == row.get(name):
                total[name] += reps * row[name]
        fmt = lambda v: f"{v*1e3:7.3f}" if v == v else "      –"
        print(f"{hw:4d}²×{C:<4d} k{k} s{stride} {floor*1e3:7.3f} "
              f"{fmt(row['dw'])} {fmt(row['g8'])} {fmt(row['g32'])} "
              f"{fmt(row['dense']):>8s}   best={fmt(best)}", flush=True)
    print(f"\nper-iter dw total (shipped): {total['dw']*1e3:.2f} ms; "
          f"best-mix total: {total['best_mix']*1e3:.2f} ms "
          f"({total['dw']/max(total['best_mix'],1e-9):.2f}x)")


if __name__ == "__main__":
    main()
