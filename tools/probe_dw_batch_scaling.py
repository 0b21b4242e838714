"""Per-batch slope table for the fused dwconv kernel at the stem shape.

VERDICT r4 item 8: the fused-dw auto routing was pinned by one probe at
one batch size, so nothing caught the b64 cliff before it shipped.  This
probe A/Bs the double-buffered Pallas kernel (r5) against XLA's
dw+BN+swish at the B0 stem-block shape (256², C=32, k3 s1) across
batches, slope method, and records

    dw_kernel_stem_b{N}_fused_ms / _xla_ms / _speedup

into baseline_measured.json (provenance-stamped).  These are the numbers
``FUSED_DW_AUTO_MAX_BATCH`` must match.

Measurement note: per-iteration times here are 0.03–7 ms while the axon
tunnel's RPC constant jitters by ~1 ms, so K_LARGE must be large —
K_LARGE=9 (the r2/r4 probes) has ~0.2 ms slope resolution and produced
both the "XLA wins everywhere" table and a negative b1 time; K_LARGE=65
resolves to ~0.015 ms.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

K_SMALL, K_LARGE = 1, 65
HW, C, K = 256, 32, 3


def chain(fn):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x, w, s, o, k):
        def body(i, carry):
            y = fn(carry, w, s, o, 1)
            return carry + (jnp.sum(y.astype(jnp.float32)) * 1e-12
                            ).astype(carry.dtype)
        out = jax.lax.fori_loop(0, k, body, x)
        return jnp.sum(out.astype(jnp.float32))

    return run


def slope(run, args):
    best = 1e9
    for k in (K_SMALL, K_LARGE):
        np.asarray(run(*args, k))  # warm/compile
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(*args, K_SMALL))
        a = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(run(*args, K_LARGE))
        b = time.perf_counter() - t0
        best = min(best, (b - a) / (K_LARGE - K_SMALL))
    return best


def main(batches=(1, 8, 32, 64)):
    import jax
    import jax.numpy as jnp

    from tmv_tpu.kernels.dwconv_pallas import dw_reference, fused_dw_bn_swish

    print(f"devices: {jax.devices()}  stem shape {HW}²×{C} k{K} s1 bf16")
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(K, K, C)).astype(np.float32))
    s = jnp.asarray(rng.uniform(0.5, 1.5, C).astype(np.float32))
    o = jnp.asarray(rng.normal(size=C).astype(np.float32))
    run_f = chain(fused_dw_bn_swish)
    run_r = chain(dw_reference)

    out = {}
    for b in batches:
        x = jnp.asarray(rng.uniform(size=(b, HW, HW, C))
                        .astype(np.float32)).astype(jnp.bfloat16)
        if b == batches[0]:
            yf = np.asarray(fused_dw_bn_swish(x, w, s, o, 1), np.float32)
            yr = np.asarray(dw_reference(x, w, s, o, 1), np.float32)
            rel = float(np.max(np.abs(yf - yr))
                        / (np.max(np.abs(yr)) + 1e-9))
            print(f"numerics b{b}: rel_err {rel:.2e}")
            out["dw_kernel_stem_rel_err"] = rel
        tf_ = slope(run_f, (x, w, s, o))
        tr = slope(run_r, (x, w, s, o))
        print(f"b{b:3d}: fused {tf_ * 1e3:8.3f} ms   xla {tr * 1e3:8.3f} ms"
              f"   ({tr / tf_:4.2f}x fused win)")
        out[f"dw_kernel_stem_b{b}_fused_ms"] = round(tf_ * 1e3, 3)
        out[f"dw_kernel_stem_b{b}_xla_ms"] = round(tr * 1e3, 3)
        out[f"dw_kernel_stem_b{b}_speedup"] = round(tr / tf_, 3)

    from tools._prov import update_measured
    update_measured(out)
    print(json.dumps(out))


if __name__ == "__main__":
    bs = tuple(int(b) for b in sys.argv[1].split(",")) if len(sys.argv) > 1 \
        else (1, 8, 32, 64)
    main(bs)
