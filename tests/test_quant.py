"""Dynamic int8 quantization: numerics and flax integration."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tmv_tpu.models.layers.common import ConvBN
from tmv_tpu.quant import dynamic_int8_conv, quant_mode, quantized


class TestDynamicInt8Conv:
    def test_close_to_float_conv(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 16, 16, 32)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(3, 3, 32, 64)).astype(np.float32))
        dn = jax.lax.conv_dimension_numbers(
            x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn)
        out = dynamic_int8_conv(x, w)
        rel = (np.max(np.abs(np.asarray(out) - np.asarray(ref)))
               / np.max(np.abs(np.asarray(ref))))
        assert rel < 0.03, rel

    def test_scale_offset_folding(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 8, 8, 8)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(1, 1, 8, 4)).astype(np.float32))
        s = jnp.asarray(rng.uniform(0.5, 2.0, (4,)).astype(np.float32))
        o = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))
        base = np.asarray(dynamic_int8_conv(x, w))
        out = np.asarray(dynamic_int8_conv(x, w, out_scale=s, out_offset=o))
        np.testing.assert_allclose(out, base * np.asarray(s) + np.asarray(o),
                                   rtol=1e-5, atol=1e-5)

    def test_mode_context(self):
        assert quant_mode() == "off"
        with quantized():
            assert quant_mode() == "int8"
            with quantized("off"):
                assert quant_mode() == "off"
            assert quant_mode() == "int8"
        assert quant_mode() == "off"


class TestQuantConvBN:
    @pytest.mark.parametrize("strides", [1, 2])
    def test_same_tree_and_close_output(self, rng, strides):
        model = ConvBN(16, 3, strides=strides, act="mish")
        x = jnp.asarray(rng.normal(size=(2, 16, 16, 8)).astype(np.float32))

        v1 = model.init(jax.random.key(0), x, train=False)
        with quantized():
            v2 = model.init(jax.random.key(0), x, train=False)

        p1 = jax.tree_util.tree_leaves_with_path(v1)
        p2 = jax.tree_util.tree_leaves_with_path(v2)
        assert [k for k, _ in p1] == [k for k, _ in p2]
        for (_, a), (_, b) in zip(p1, p2):
            assert a.shape == b.shape and a.dtype == b.dtype

        # give BN stats non-trivial values so the folding is exercised
        v = jax.tree.map(lambda t: t, v1)
        v["batch_stats"] = jax.tree.map(
            lambda t: t + 0.3 * jnp.arange(t.shape[0], dtype=t.dtype)
            / t.shape[0], v["batch_stats"])
        ref = model.apply(v, x, train=False)
        with quantized():
            out = model.apply(v, x, train=False)
        rel = (np.max(np.abs(np.asarray(out) - np.asarray(ref)))
               / (np.max(np.abs(np.asarray(ref))) + 1e-9))
        assert rel < 0.05, rel

    def test_train_mode_ignores_quant_flag(self, rng):
        model = ConvBN(8, 3, act="leaky")
        x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
        v = model.init(jax.random.key(0), x, train=False)
        ref, m1 = model.apply(v, x, train=True, mutable=["batch_stats"])
        with quantized():
            out, m2 = model.apply(v, x, train=True, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out))
        for a, b in zip(jax.tree_util.tree_leaves(m1),
                        jax.tree_util.tree_leaves(m2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))


class TestStaticInt8:
    def _stack(self):
        import flax.linen as nn

        class Stack(nn.Module):
            @nn.compact
            def __call__(self, x, train: bool = False):
                x = ConvBN(16, 3, act="mish")(x, train)
                x = ConvBN(24, 3, strides=2, act="leaky")(x, train)
                return ConvBN(8, 1, act="linear")(x, train)

        return Stack()

    def test_calibrate_prepare_and_match_float(self, rng):
        from tmv_tpu.quant import (
            calibrate_model, prepare_static_int8_variables,
        )

        model = self._stack()
        x = jnp.asarray(rng.normal(size=(2, 16, 16, 4)).astype(np.float32))
        v = model.init(jax.random.key(0), x, train=False)
        v["batch_stats"] = jax.tree.map(
            lambda t: t + 0.3 * jnp.arange(t.shape[0], dtype=t.dtype)
            / t.shape[0], v["batch_stats"])

        batches = [x, x * 0.5, x * 1.5]
        absmax = calibrate_model(model, v, batches, train=False)
        # one tap per ConvBN site
        leaves = jax.tree_util.tree_leaves_with_path(absmax)
        assert len(leaves) == 3
        qv = prepare_static_int8_variables(v, absmax)
        assert set(qv) == {"params", "batch_stats", "quant"}
        for _, leaf in jax.tree_util.tree_leaves_with_path(
                qv["quant"]):
            assert np.isfinite(np.asarray(leaf)).all()

        ref = model.apply(v, x, train=False)
        with quantized("int8_static"):
            out = model.apply(qv, x, train=False)
        rel = (np.max(np.abs(np.asarray(out) - np.asarray(ref)))
               / (np.max(np.abs(np.asarray(ref))) + 1e-9))
        assert rel < 0.06, rel

    def test_margin_scales_activation_absmax_only(self, rng):
        """margin multiplies every calibrated in_absmax leaf and leaves
        the pre-quantized weights untouched (the outlier-clipping dial
        behind --int8Margin; tools/probe_int8_v4_drop.py)."""
        from tmv_tpu.quant import (
            calibrate_model, prepare_static_int8_variables,
        )

        model = self._stack()
        x = jnp.asarray(rng.normal(size=(2, 16, 16, 4)).astype(np.float32))
        v = model.init(jax.random.key(0), x, train=False)
        absmax = calibrate_model(model, v, [x], train=False)
        q1 = prepare_static_int8_variables(v, absmax)["quant"]
        qm = prepare_static_int8_variables(v, absmax, margin=0.5)["quant"]
        flat1 = dict(jax.tree_util.tree_leaves_with_path(q1))
        flatm = dict(jax.tree_util.tree_leaves_with_path(qm))
        n_act = 0
        for path, leaf in flat1.items():
            name = path[-1].key
            if name.startswith("in_absmax"):
                np.testing.assert_allclose(
                    np.asarray(flatm[path]), 0.5 * np.asarray(leaf),
                    rtol=1e-6)
                n_act += 1
            else:
                np.testing.assert_array_equal(np.asarray(flatm[path]),
                                              np.asarray(leaf))
        assert n_act == 3

    def test_per_channel_beats_per_tensor_on_skewed_input(self, rng):
        """Per-input-channel activation scales (--int8PerChannel) recover
        accuracy when one channel's range dwarfs the others — the regime
        where a single per-tensor scale starves every other channel of
        int8 resolution (converged-Mish symptom; probe_int8_v4_drop)."""
        from tmv_tpu.quant import (
            calibrate_model, prepare_static_int8_variables,
        )

        model = self._stack()
        x = rng.normal(size=(2, 16, 16, 4)).astype(np.float32)
        x[..., 0] *= 200.0  # one outlier channel...
        x = jnp.asarray(x)
        v = model.init(jax.random.key(0), x, train=False)
        # ...that carries no signal: the first conv ignores it, but a
        # per-tensor activation scale is still set by it, squeezing the
        # three signal channels into ±~0.6 int8 levels
        k = np.array(
            v["params"]["ConvBN_0"]["DarknetConv_0"]["Conv_0"]["kernel"])
        k[:, :, 0, :] = 0.0
        v["params"]["ConvBN_0"]["DarknetConv_0"]["Conv_0"]["kernel"] = (
            jnp.asarray(k))
        absmax = calibrate_model(model, v, [x], train=False)
        ref = np.asarray(model.apply(v, x, train=False))

        def rel_err(per_channel):
            qv = prepare_static_int8_variables(v, absmax,
                                               per_channel=per_channel)
            with quantized("int8_static"):
                out = model.apply(qv, x, train=False)
            return (np.max(np.abs(np.asarray(out) - ref))
                    / (np.max(np.abs(ref)) + 1e-9))

        pt, pc = rel_err(False), rel_err(True)
        # the skewed first conv input is where per-tensor loses its
        # resolution; per-channel must be strictly and materially better
        assert pc < pt * 0.5, (pt, pc)
        assert pc < 0.06, pc

    def test_no_runtime_statistics_passes(self, rng):
        """The static trace must contain no reduction over activations:
        the only reduce ops allowed are the conv itself (and none over
        the full input tensor for scales)."""
        from tmv_tpu.quant import (
            calibrate_model, prepare_static_int8_variables,
        )

        model = self._stack()
        x = jnp.asarray(rng.normal(size=(1, 16, 16, 4)).astype(np.float32))
        v = model.init(jax.random.key(0), x, train=False)
        qv = prepare_static_int8_variables(
            v, calibrate_model(model, v, [x], train=False))

        def fwd(qv, x):
            with quantized("int8_static"):
                return model.apply(qv, x, train=False)

        def collect(jxp, out):
            for e in jxp.eqns:
                if e.primitive.name in ("reduce_max", "reduce_min"):
                    out.append(e)
                for v in e.params.values():
                    if hasattr(v, "jaxpr"):
                        collect(v.jaxpr, out)
            return out

        reduces = collect(jax.make_jaxpr(fwd)(qv, x).jaxpr, [])
        assert not reduces, reduces

    def test_out_of_range_inputs_saturate(self, rng):
        """Inputs beyond the calibrated range clip to ±127 — outputs stay
        finite (saturation, not wraparound)."""
        from tmv_tpu.quant import (
            calibrate_model, prepare_static_int8_variables,
        )

        model = self._stack()
        x = jnp.asarray(rng.normal(size=(1, 16, 16, 4)).astype(np.float32))
        v = model.init(jax.random.key(0), x, train=False)
        qv = prepare_static_int8_variables(
            v, calibrate_model(model, v, [x], train=False))
        with quantized("int8_static"):
            out = model.apply(qv, 50.0 * x, train=False)
        assert np.isfinite(np.asarray(out)).all()

    def test_static_predictor_runs(self, rng):
        from tmv_tpu.models.detector_harness import make_yolo_predict
        from tmv_tpu.models.yolo_v3 import YoloV3
        from tmv_tpu.quant import (
            calibrate_model, prepare_static_int8_variables,
        )

        size = 64
        anchors = np.asarray(
            [[[116, 90], [156, 198], [373, 326]],
             [[30, 61], [62, 45], [59, 119]],
             [[10, 13], [16, 30], [33, 23]]], np.float32) * size / 416
        model = YoloV3(classes_num=3)
        v = model.init(jax.random.key(0),
                       jnp.zeros((1, size, size, 3)), train=False)
        v = {"params": jax.tree.map(lambda t: t * 0.2, v["params"]),
             "batch_stats": v["batch_stats"]}
        img = jnp.asarray(
            rng.uniform(size=(1, size, size, 3)).astype(np.float32))
        qv = prepare_static_int8_variables(
            v, calibrate_model(model, v, [img], train=False))
        predict = make_yolo_predict(model, (size, size), anchors, 3,
                                    confidence_thresh=0.0, scores_thresh=0.0,
                                    max_output_size=8, quant="int8_static")
        boxes, ids, scores, valid = predict(qv, img)
        assert np.isfinite(np.asarray(scores)[np.asarray(valid)]).all()
        assert np.asarray(valid).any()


class TestStaticInt8EfficientNet:
    """Static-int8 on the EfficientNet backbone (Stem + MBConv sites,
    multi-conv modules → suffixed quant leaves)."""

    def _backbone(self):
        from tmv_tpu.models.efficientdet.backbone import BackboneModel
        from tmv_tpu.models.efficientdet.config import default_blocks_args

        return BackboneModel(blocks_args=tuple(default_blocks_args()[:3]))

    def test_param_tree_identical(self, rng):
        model = self._backbone()
        x = jnp.zeros((1, 32, 32, 3))
        v1 = model.init(jax.random.key(0), x, train=False)
        with quantized("int8_static"):
            v2 = model.init(jax.random.key(0), x, train=False)
        p1 = jax.tree_util.tree_leaves_with_path(
            {k: v1[k] for k in ("params", "batch_stats")})
        p2 = jax.tree_util.tree_leaves_with_path(
            {k: v2[k] for k in ("params", "batch_stats")})
        assert [k for k, _ in p1] == [k for k, _ in p2]
        for (_, a), (_, b) in zip(p1, p2):
            assert a.shape == b.shape and a.dtype == b.dtype

    def test_calibrate_prepare_and_match_float(self, rng):
        from tmv_tpu.quant import (
            calibrate_model, prepare_static_int8_variables,
        )

        model = self._backbone()
        x = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)).astype(np.float32))
        v = model.init(jax.random.key(0), x, train=False)
        v["batch_stats"] = jax.tree.map(
            lambda t: t + 0.2 * jnp.arange(t.shape[0], dtype=t.dtype)
            / t.shape[0], v["batch_stats"])
        absmax = calibrate_model(model, v, [x, x * 0.7], train=False)
        # Stem (1 conv) + blocks: expand?+dw+project per block
        n_taps = len(jax.tree_util.tree_leaves(absmax))
        assert n_taps >= 7, n_taps
        qv = prepare_static_int8_variables(v, absmax)
        ref = model.apply(v, x, train=False)
        with quantized("int8_static"):
            out = model.apply(qv, x, train=False)
        for a, b in zip(ref, out):
            a, b = np.asarray(a), np.asarray(b)
            assert np.isfinite(b).all()
            rel = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
            assert rel < 0.08, rel

    def test_per_channel_through_depthwise_blocks(self, rng):
        """per_channel=True folds the channel scales through the grouped
        (depthwise) kernels of the real MBConv path — the I=1 kernel axis
        maps each output channel to its own input scale."""
        from tmv_tpu.quant import (
            calibrate_model, prepare_static_int8_variables,
        )

        model = self._backbone()
        x = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)).astype(np.float32))
        v = model.init(jax.random.key(0), x, train=False)
        absmax = calibrate_model(model, v, [x], train=False)
        qv = prepare_static_int8_variables(v, absmax, per_channel=True)
        ref = model.apply(v, x, train=False)
        with quantized("int8_static"):
            out = model.apply(qv, x, train=False)
        for a, b in zip(ref, out):
            a, b = np.asarray(a), np.asarray(b)
            assert np.isfinite(b).all()
            rel = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
            assert rel < 0.08, rel

    def test_fused_dw_mode_still_calibrates(self, rng):
        """Regression (r4, seen live at D0@512): with the fused-depthwise
        eval path active, calibration must still fall through to the stock
        XLA branch and sow every dw absmax — the fused branch used to
        swallow "calib" mode, leaving int8_static to fail on the missing
        quant variable (`in_absmax_Conv_*`)."""
        from tmv_tpu.models.efficientdet.backbone import BackboneModel
        from tmv_tpu.models.efficientdet.config import default_blocks_args
        from tmv_tpu.quant import (
            calibrate_model, prepare_static_int8_variables,
        )

        plain = self._backbone()
        fused = BackboneModel(blocks_args=tuple(default_blocks_args()[:3]),
                              fused_dw_eval=True)
        x = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)).astype(np.float32))
        v = plain.init(jax.random.key(0), x, train=False)
        ref_absmax = calibrate_model(plain, v, [x], train=False)
        absmax = calibrate_model(fused, v, [x], train=False)
        ref_taps = jax.tree_util.tree_leaves_with_path(ref_absmax)
        taps = jax.tree_util.tree_leaves_with_path(absmax)
        assert [k for k, _ in taps] == [k for k, _ in ref_taps]
        qv = prepare_static_int8_variables(v, absmax)
        with quantized("int8_static"):
            out = fused.apply(qv, x, train=False)  # raised before the fix
        for o in out:
            assert np.isfinite(np.asarray(o)).all()

    def test_separable_conv_sites(self, rng):
        """BiFPN/head SeparableConvs quantize themselves (depthwise +
        pointwise sites, level-shared scales); the head ``predict`` conv
        is pinned float."""
        import flax.linen as nn

        from tmv_tpu.models.efficientdet.heads import _PredictionNet
        from tmv_tpu.quant import (
            calibrate_model, prepare_static_int8_variables,
        )

        model = _PredictionNet(out_per_anchor=4, num_anchors=3,
                               num_filters=16, num_levels=2, repeats=2,
                               survival_prob=None, predict_bias_init=0.0)
        x = [jnp.asarray(rng.normal(size=(1, 8 // (1 + i), 8 // (1 + i),
                                          16)).astype(np.float32))
             for i in range(2)]
        v1 = model.init(jax.random.key(0), x, train=False)
        with quantized("int8_static"):
            v2 = model.init(jax.random.key(0), x, train=False)
        p1 = jax.tree_util.tree_leaves_with_path(
            {k: v1[k] for k in ("params", "batch_stats")})
        p2 = jax.tree_util.tree_leaves_with_path(
            {k: v2[k] for k in ("params", "batch_stats")})
        assert [k for k, _ in p1] == [k for k, _ in p2]

        absmax = calibrate_model(model, v1, [x], train=False)
        leaves = {jax.tree_util.keystr(p)
                  for p, _ in jax.tree_util.tree_leaves_with_path(absmax)}
        # repeats=2 convs × (depthwise+pointwise); predict NOT calibrated
        assert len(leaves) == 4, leaves
        assert not any("predict" in k for k in leaves)

        qv = prepare_static_int8_variables(v1, absmax)
        ref = model.apply(v1, x, train=False)
        with quantized("int8_static"):
            out = model.apply(qv, x, train=False)
        for a, b in zip(ref, out):
            a, b = np.asarray(a), np.asarray(b)
            assert np.isfinite(b).all()
            rel = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
            assert rel < 0.1, rel

    @pytest.mark.slow  # traces full D0 twice (calib + int8)
    def test_full_net_eval_harness_int8(self, rng):
        from tmv_tpu.models.efficientdet import (
            EfficientDetNet, get_efficientdet_config,
        )
        from tmv_tpu.models.efficientdet.harness import (
            make_efficientdet_pred_gt,
        )
        from tmv_tpu.ops.anchors import Anchors
        from tmv_tpu.quant import (
            calibrate_model, prepare_static_int8_variables,
        )

        cfg = get_efficientdet_config("efficientdet-d0")
        cfg.image_size = 64
        cfg.num_classes = 4
        cfg.levels_size = [64]
        for _ in range(cfg.max_level):
            cfg.levels_size.append((cfg.levels_size[-1] + 1) // 2)
        model = EfficientDetNet(config=cfg)
        anchors = Anchors(cfg.min_level, cfg.max_level, (64, 64),
                          cfg.num_scales, cfg.aspect_ratios,
                          cfg.anchor_scale)
        x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
        v = model.init(jax.random.key(0), x, train=False)
        qv = prepare_static_int8_variables(
            v, calibrate_model(model, v, [x], train=False))
        collect = make_efficientdet_pred_gt(model, anchors,
                                            quant="int8_static")
        batch = {"image": x, "raw": [(np.zeros((0, 4), np.float32),
                                      np.zeros((0,), np.int64))]}
        (pred, _), = collect(qv, batch)
        assert np.isfinite(np.asarray(pred)).all()


@pytest.mark.slow  # traces full YOLOv4 under the int8 flag
class TestQuantYoloStack:
    def test_yolov4_forward_under_quant(self, rng):
        """Whole YoloV4 traces and runs under the int8 flag; heads stay
        finite and within a loose relative band of the float path."""
        from tmv_tpu.models.yolo_v4 import YoloV4

        model = YoloV4(classes_num=3)
        x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
        v = model.init(jax.random.key(0), x, train=False)
        ref = model.apply(v, x, train=False)
        with quantized():
            out = model.apply(v, x, train=False)
        for a, b in zip(ref, out):
            a, b = np.asarray(a), np.asarray(b)
            assert np.isfinite(b).all()
            assert a.shape == b.shape
            denom = np.max(np.abs(a)) + 1e-9
            assert np.max(np.abs(a - b)) / denom < 0.5


class TestQuantPredictor:
    def test_make_yolo_predict_int8_runs(self, rng):
        from tmv_tpu.models.detector_harness import make_yolo_predict
        from tmv_tpu.models.yolo_v3 import YoloV3

        size = 64
        anchors = np.asarray(
            [[[116, 90], [156, 198], [373, 326]],
             [[30, 61], [62, 45], [59, 119]],
             [[10, 13], [16, 30], [33, 23]]], np.float32) * size / 416
        model = YoloV3(classes_num=3)
        v = model.init(jax.random.key(0),
                       jnp.zeros((1, size, size, 3)), train=False)
        # tame exp(tw) decode overflow from random-init heads
        v = {"params": jax.tree.map(lambda t: t * 0.2, v["params"]),
             "batch_stats": v["batch_stats"]}
        predict = make_yolo_predict(model, (size, size), anchors, 3,
                                    confidence_thresh=0.0, scores_thresh=0.0,
                                    max_output_size=8, quant="int8")
        img = jnp.asarray(
            rng.uniform(size=(1, size, size, 3)).astype(np.float32))
        boxes, ids, scores, valid = predict(v, img)
        assert np.isfinite(np.asarray(scores)[np.asarray(valid)]).all()
        assert np.asarray(valid).any()


class TestQuantBatchedPredictor:
    def test_batched_int8_static_matches_single(self, rng):
        """`serve --batch N --int8Static` path: the batched int8 predictor
        reproduces the per-image int8 predictor."""
        from tmv_tpu.models.detector_harness import (
            make_yolo_predict, make_yolo_predict_batched,
        )
        from tmv_tpu.models.yolo_v3 import YoloV3
        from tmv_tpu.quant import (
            calibrate_model, prepare_static_int8_variables,
        )

        size = 64
        anchors = np.asarray(
            [[[116, 90], [156, 198], [373, 326]],
             [[30, 61], [62, 45], [59, 119]],
             [[10, 13], [16, 30], [33, 23]]], np.float32) * size / 416
        model = YoloV3(classes_num=3)
        v = model.init(jax.random.key(0),
                       jnp.zeros((1, size, size, 3)), train=False)
        v = {"params": jax.tree.map(lambda t: t * 0.2, v["params"]),
             "batch_stats": v["batch_stats"]}
        imgs = jnp.asarray(rng.uniform(
            size=(3, size, size, 3)).astype(np.float32))
        qv = prepare_static_int8_variables(
            v, calibrate_model(model, v, [imgs], train=False))

        single = make_yolo_predict(
            model, (size, size), anchors, 3, confidence_thresh=0.0,
            scores_thresh=0.0, max_output_size=8, quant="int8_static")
        batched = make_yolo_predict_batched(
            model, (size, size), anchors, 3, confidence_thresh=0.0,
            scores_thresh=0.0, max_output_size=8, quant="int8_static")

        bb, bi, bs, bv = (np.asarray(t) for t in batched(qv, imgs))
        for i in range(3):
            rb, ri, rs, rv = (np.asarray(t)
                              for t in single(qv, imgs[i:i + 1]))
            np.testing.assert_array_equal(rv, bv[i])
            m = rv
            np.testing.assert_allclose(rb[m], bb[i][m], rtol=1e-4,
                                       atol=1e-4)
            np.testing.assert_array_equal(ri[m], bi[i][m])
