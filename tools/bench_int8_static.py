"""YOLOv4 inference: static-calibration int8 vs dynamic int8 vs bf16, TPU.

The static path (`tmv_tpu/quant/static.py`) removes every runtime
statistics pass: activation scales are calibrated offline, weights are
pre-quantized host-side.  The input quantize is then a pure elementwise
op, so XLA fuses dequant→BN→mish→requant into one epilogue chain and the
inter-conv HBM buffers can materialize as int8 — attacking the bandwidth
bound that made *dynamic* int8 a measured e2e loss (0.84×/0.79×,
PARITY §6).

Slope-method per-iter times (see bench.py); head-output drift vs the f32
path recorded for both int8 variants.  Appends to baseline_measured.json.
"""
import json
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


def bench(size=416, batch=16, results=None):
    import jax
    import jax.numpy as jnp

    from tmv_tpu.models.yolo_v4 import YoloV4
    from tmv_tpu.quant import (
        calibrate_model, prepare_static_int8_variables, quantized,
    )

    rng = np.random.default_rng(0)
    model = YoloV4(classes_num=80, dtype=jnp.bfloat16)
    v = model.init(jax.random.key(0),
                   jnp.zeros((1, size, size, 3)), train=False)
    x = jnp.asarray(
        rng.uniform(size=(batch, size, size, 3)).astype(np.float32))

    # offline calibration over a few batches (image-statistics inputs)
    calib = [jnp.asarray(rng.uniform(size=(2, size, size, 3))
                         .astype(np.float32)) for _ in range(3)]
    stats = calibrate_model(model, v, calib, train=False)
    qv = prepare_static_int8_variables(v, stats)
    # per-input-channel activation scales (the recommended v4 mode after
    # the per-tensor mAP collapse): scales fold into the pre-quantized
    # weights offline, so the runtime graph should cost the same — this
    # records the evidence instead of asserting it
    qv_pc = prepare_static_int8_variables(v, stats, per_channel=True)

    def make_chain(mode, vv):
        def fwd(vv_, a):
            heads = model.apply(vv_, a, train=False)
            return sum(jnp.sum(h.astype(jnp.float32)) for h in heads)

        with quantized(mode):
            @jax.jit
            def chain(vv_, a, k):
                def body(i, carry):
                    s = fwd(vv_, carry)
                    return carry + (s * 1e-12).astype(carry.dtype)
                return jnp.sum(
                    jax.lax.fori_loop(0, k, body, a).astype(jnp.float32))

            _ = chain.lower(vv, x, 1)
        return chain

    chain_p = make_chain("off", v)
    chain_d = make_chain("int8", v)
    chain_s = make_chain("int8_static", qv)
    chain_pc = make_chain("int8_static", qv_pc)

    t_p = slope_time(lambda k: np.asarray(chain_p(v, x, k)))
    t_d = slope_time(lambda k: np.asarray(chain_d(v, x, k)))
    t_s = slope_time(lambda k: np.asarray(chain_s(qv, x, k)))
    t_pc = slope_time(lambda k: np.asarray(chain_pc(qv_pc, x, k)))

    # head drift vs f32 reference
    model32 = YoloV4(classes_num=80, dtype=jnp.float32)
    ref = model32.apply(v, x[:1], train=False)

    def drift_of(mode, vv):
        with quantized(mode):
            out = jax.jit(
                lambda v_, a: model.apply(v_, a, train=False))(vv, x[:1])
        return max(
            float(np.max(np.abs(np.asarray(a, np.float32)
                                - np.asarray(b, np.float32)))
                  / (np.max(np.abs(np.asarray(a, np.float32))) + 1e-9))
            for a, b in zip(ref, out))

    d_d = drift_of("int8", v)
    d_s = drift_of("int8_static", qv)
    d_pc = drift_of("int8_static", qv_pc)

    print(f"YOLOv4 @{size} b{batch}: bf16 {t_p*1e3:7.2f} ms "
          f"({batch/t_p:.0f} img/s) | dyn-int8 {t_d*1e3:7.2f} ms "
          f"({t_p/t_d:.2f}x, drift {d_d:.3f}) | static-int8 "
          f"{t_s*1e3:7.2f} ms ({t_p/t_s:.2f}x, drift {d_s:.3f}) | "
          f"static-int8-pc {t_pc*1e3:7.2f} ms ({t_p/t_pc:.2f}x, "
          f"drift {d_pc:.3f})")
    if results is not None:
        results[f"yolov4_{size}_bf16_ms"] = round(t_p * 1e3, 2)
        results[f"yolov4_{size}_int8_dynamic_speedup"] = round(t_p / t_d, 3)
        results[f"yolov4_{size}_int8_static_speedup"] = round(t_p / t_s, 3)
        results[f"yolov4_{size}_int8_static_head_drift"] = round(d_s, 3)
        results[f"yolov4_{size}_int8_static_pc_speedup"] = round(
            t_p / t_pc, 3)
        results[f"yolov4_{size}_int8_static_pc_head_drift"] = round(d_pc, 3)


def bench_d0(size=512, batch=32, results=None):
    """EfficientDet-D0: static-int8 backbone convs (Stem/MBConv sites —
    the backbone is 19.0 of 21.6 ms, PARITY §6) vs bf16.  BiFPN/heads
    stay float in both."""
    import jax
    import jax.numpy as jnp

    from tmv_tpu.models.efficientdet import (
        EfficientDetNet, get_efficientdet_config,
    )
    from tmv_tpu.quant import (
        calibrate_model, prepare_static_int8_variables, quantized,
    )

    rng = np.random.default_rng(0)
    cfg = get_efficientdet_config("efficientdet-d0")
    cfg.image_size = size
    cfg.levels_size = [size]
    for _ in range(cfg.max_level):
        cfg.levels_size.append((cfg.levels_size[-1] + 1) // 2)
    model = EfficientDetNet(config=cfg, dtype=jnp.bfloat16)
    v = model.init(jax.random.key(0),
                   jnp.zeros((1, size, size, 3)), train=False)
    x = jnp.asarray(
        rng.uniform(size=(batch, size, size, 3)).astype(np.float32))
    calib = [jnp.asarray(rng.uniform(size=(2, size, size, 3))
                         .astype(np.float32)) for _ in range(3)]
    qv = prepare_static_int8_variables(
        v, calibrate_model(model, v, calib, train=False))

    def make_chain(mode):
        def fwd(vv, a):
            boxes, classes = model.apply(vv, a, train=False)
            return sum(jnp.sum(h.astype(jnp.float32))
                       for h in list(boxes) + list(classes))

        with quantized(mode):
            @jax.jit
            def chain(vv, a, k):
                def body(i, carry):
                    s = fwd(vv, carry)
                    return carry + (s * 1e-12).astype(carry.dtype)
                return jnp.sum(
                    jax.lax.fori_loop(0, k, body, a).astype(jnp.float32))

            _ = chain.lower(qv if mode == "int8_static" else v, x, 1)
        return chain

    chain_p = make_chain("off")
    chain_s = make_chain("int8_static")
    t_p = slope_time(lambda k: np.asarray(chain_p(v, x, k)))
    t_s = slope_time(lambda k: np.asarray(chain_s(qv, x, k)))

    model32 = EfficientDetNet(config=cfg, dtype=jnp.float32)
    rb, rc = model32.apply(v, x[:1], train=False)
    with quantized("int8_static"):
        ob, oc = jax.jit(
            lambda v_, a: model.apply(v_, a, train=False))(qv, x[:1])
    drift = max(
        float(np.max(np.abs(np.asarray(a, np.float32)
                            - np.asarray(b, np.float32)))
              / (np.max(np.abs(np.asarray(a, np.float32))) + 1e-9))
        for a, b in zip(list(rb) + list(rc), list(ob) + list(oc)))

    print(f"D0 @{size} b{batch}: bf16 {t_p*1e3:7.2f} ms "
          f"({batch/t_p:.0f} img/s) | static-int8 {t_s*1e3:7.2f} ms "
          f"({t_p/t_s:.2f}x, head drift {drift:.3f})")
    if results is not None:
        results[f"d0_{size}_bf16_ms"] = round(t_p * 1e3, 2)
        results[f"d0_{size}_int8_static_speedup"] = round(t_p / t_s, 3)
        results[f"d0_{size}_int8_static_head_drift"] = round(drift, 3)


def main():
    results = {}
    if "--640-only" in sys.argv:  # the headline int8 serving shape
        bench(640, results=results)
    else:
        if "--d0-only" not in sys.argv:
            bench(416, results=results)
            bench(640, results=results)
        bench_d0(512, results=results)
    from tools._prov import update_measured
    update_measured({f"static_int8_bench_{k}": v
                     for k, v in results.items()})


if __name__ == "__main__":
    main()
