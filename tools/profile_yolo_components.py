"""Where does the YOLOv4 eval forward spend time?

Slope-method timings (see bench.py) for the stages run standalone —
CSPDarknet backbone, SPP+PAN neck+heads (full net minus backbone is not
separable without re-plumbing, so we time backbone and full net and report
the difference), plus the decode+NMS predict tail at batch 1.
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


def main(size=416, batch=16):
    import jax
    import jax.numpy as jnp

    import flax.linen as nn

    from tmv_tpu.models.detector_harness import make_yolo_predict
    from tmv_tpu.models.layers.common import ConvBN
    from tmv_tpu.models.yolo_v4 import BlocksLayer, BlocksLayer2, YoloV4

    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.uniform(size=(batch, size, size, 3)).astype(np.float32))

    model = YoloV4(classes_num=80, dtype=dtype)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, size, size, 3)), train=False)

    class CSPBackbone(nn.Module):
        """Timing-only replica of the YoloV4 backbone prefix."""

        @nn.compact
        def __call__(self, x, train: bool = False):
            x = ConvBN(32, 3, act="mish", dtype=dtype)(x, train)
            x = BlocksLayer(64, dtype)(x, train)
            x = BlocksLayer2(128, 2, dtype)(x, train)
            x = BlocksLayer2(256, 8, dtype)(x, train)
            y3 = x
            x = BlocksLayer2(512, 8, dtype)(x, train)
            y2 = x
            x = BlocksLayer2(1024, 4, dtype)(x, train)
            return x, y2, y3

    backbone = CSPBackbone()
    bb_vars = backbone.init(jax.random.key(1), x[:1], False)

    def chain(apply_fn, v, x0):
        @jax.jit
        def run(v, img, k):
            def body(i, carry):
                s = apply_fn(v, carry)
                return carry + (s * 1e-12).astype(carry.dtype)
            out = jax.lax.fori_loop(0, k, body, x0)
            return jnp.sum(out.astype(jnp.float32))
        return lambda k: np.asarray(run(v, x0, k))

    def full_fn(v, img):
        heads = model.apply(v, img, train=False)
        return sum(jnp.sum(h.astype(jnp.float32)) for h in heads)

    def bb_fn(v, img):
        feats = backbone.apply(v, img, False)
        return sum(jnp.sum(f.astype(jnp.float32)) for f in feats)

    anchors = np.array(
        [[[116, 90], [156, 198], [373, 326]],
         [[30, 61], [62, 45], [59, 119]],
         [[10, 13], [16, 30], [33, 23]]], np.float32) * size / 416
    predict = make_yolo_predict(model, (size, size), anchors, 80,
                                iou_type="diou")
    x1 = x[:1]

    def predict_fn(v, img):
        boxes, scores, classes, valid = predict(v, img)
        return (jnp.sum(boxes.astype(jnp.float32))
                + jnp.sum(scores.astype(jnp.float32)))

    t_full = slope_time(chain(full_fn, variables, x))
    t_bb = slope_time(chain(bb_fn, bb_vars, x))
    t_pred = slope_time(chain(predict_fn, variables, x1))
    t_fwd1 = slope_time(chain(full_fn, variables, x1))
    print(f"YOLOv4 @{size} b{batch} bf16 (per-iter device ms, slope):")
    print(f"  backbone (CSPDarknet):     {t_bb*1e3:8.2f}")
    print(f"  neck+heads (full-bb):      {(t_full-t_bb)*1e3:8.2f}")
    print(f"  full forward:              {t_full*1e3:8.2f}"
          f"  ({batch/t_full:.0f} img/s)")
    print(f"  b1 forward:                {t_fwd1*1e3:8.2f}")
    print(f"  b1 predict (fwd+decode+NMS): {t_pred*1e3:6.2f}"
          f"  (NMS tail ≈ {(t_pred-t_fwd1)*1e3:.2f})")


if __name__ == "__main__":
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 416
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    main(size, batch)
