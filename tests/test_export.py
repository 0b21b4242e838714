"""AOT export (jax.export → StableHLO artifact) round-trip tests.

The artifact must reproduce the live predictor's outputs exactly and drop
into ``DetectionService`` unchanged (serving without the model zoo).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# compile-heavy e2e (AOT export of full predictors); smoke tier relies on
# test_serving + the forward oracle for the underlying semantics
pytestmark = pytest.mark.slow

from tmv_tpu.serving.app import DetectionService
from tmv_tpu.serving.export import (
    export_predictor,
    load_predictor,
    read_export_meta,
)


def assert_predictions_equal(ref, out, rtol=1e-6, atol=1e-6):
    """Compare (boxes, ids, scores, valid) only on the valid rows — the
    padded slots hold whatever garbage the NMS masking left behind, and
    that garbage may legitimately differ between lowerings."""
    rb, ri, rs, rv = (np.asarray(t) for t in ref)
    ob, oi, os_, ov = (np.asarray(t) for t in out)
    np.testing.assert_array_equal(rv, ov)
    v = rv.reshape(-1)
    np.testing.assert_allclose(rb.reshape(-1, 4)[v], ob.reshape(-1, 4)[v],
                               rtol=rtol, atol=atol)
    np.testing.assert_array_equal(ri.reshape(-1)[v], oi.reshape(-1)[v])
    np.testing.assert_allclose(rs.reshape(-1)[v], os_.reshape(-1)[v],
                               rtol=rtol, atol=atol)


@pytest.fixture(scope="module")
def predictor():
    from tmv_tpu.models.detector_harness import make_yolo_predict
    from tmv_tpu.models.yolo_v3 import YoloV3

    size = 64
    anchors = np.array(
        [[[116, 90], [156, 198], [373, 326]],
         [[30, 61], [62, 45], [59, 119]],
         [[10, 13], [16, 30], [33, 23]]], np.float32) * size / 416
    model = YoloV3(classes_num=3)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, size, size, 3)), train=False)
    # Random-init heads emit tw≈70+, and exp(tw) amplifies lowering-level
    # fp noise to visible relative error; scale weights down so decoded
    # boxes stay in a numerically meaningful range.
    variables = {"params": jax.tree.map(lambda x: x * 0.2,
                                        variables["params"]),
                 "batch_stats": variables["batch_stats"]}
    predict = make_yolo_predict(
        model, (size, size), anchors, 3, confidence_thresh=0.0,
        scores_thresh=0.0, iou_thresh=0.5, max_output_size=16)
    img = np.random.default_rng(0).uniform(
        size=(1, size, size, 3)).astype(np.float32)
    return predict, variables, img


class TestExport:
    def test_round_trip_unbaked(self, predictor, tmp_path):
        predict, variables, img = predictor
        ref = predict(variables, img)

        path = str(tmp_path / "yolo.tmvx")
        export_predictor(predict, variables, img, path=path,
                         platforms=("cpu",))
        loaded = load_predictor(path)
        out = loaded(variables, img)
        assert_predictions_equal(ref, out)

    def test_round_trip_baked_in_memory(self, predictor):
        predict, variables, img = predictor
        ref = predict(variables, img)

        blob = export_predictor(predict, variables, img,
                                bake_variables=True, platforms=("cpu",))
        loaded = load_predictor(blob)
        # baked artifact ignores the variables argument
        out = loaded(None, img)
        assert_predictions_equal(ref, out)

    def test_baked_artifact_drives_detection_service(self, predictor):
        predict, variables, img = predictor
        size = img.shape[1]
        service_live = DetectionService(predict, variables, ["a", "b", "c"],
                                        image_wh=(size, size))
        blob = export_predictor(predict, variables, img,
                                bake_variables=True, platforms=("cpu",))
        service_aot = DetectionService(load_predictor(blob), None,
                                       ["a", "b", "c"],
                                       image_wh=(size, size))
        raw = np.asarray(
            np.random.default_rng(1).integers(0, 255, (48, 96, 3)), np.uint8)
        b1, i1, s1, _ = service_live.predict_image(raw)
        b2, i2, s2, _ = service_aot.predict_image(raw)
        np.testing.assert_array_equal(b1, b2)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(s1, s2, rtol=1e-6)

    def test_multi_platform_lowering(self, predictor):
        """tpu+cpu lowering from a CPU process must produce one artifact."""
        predict, variables, img = predictor
        blob = export_predictor(predict, variables, img,
                                platforms=("tpu", "cpu"))
        loaded = load_predictor(blob)
        out = loaded(variables, img)
        ref = predict(variables, img)
        assert_predictions_equal(ref, out)

    def test_bad_magic_rejected(self, tmp_path):
        import io
        import tarfile

        path = str(tmp_path / "bad.tmvx")
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tar:
            info = tarfile.TarInfo("MAGIC")
            data = b"something-else"
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
        with open(path, "wb") as f:
            f.write(buf.getvalue())
        with pytest.raises(ValueError, match="magic"):
            load_predictor(path)

    def test_meta_round_trip(self, predictor, tmp_path):
        """META records input shape/dtype + caller extras (serve.py uses
        image_size to reject mismatched --imageSize up front)."""
        predict, variables, img = predictor
        path = str(tmp_path / "m.tmvx")
        export_predictor(predict, variables, img, path=path,
                         bake_variables=True,
                         meta={"image_size": img.shape[1], "version": "v3"})
        meta = read_export_meta(path)
        assert meta["input_shape"] == list(img.shape)
        assert meta["input_dtype"] == "float32"
        assert meta["image_size"] == img.shape[1]
        assert meta["version"] == "v3"
        assert "tpu" in meta["platforms"]

    def test_explicit_nms_backend_closure(self, predictor):
        """make_yolo_predict(nms_backend='xla') must trace the portable
        path even when the process-global backend says 'pallas' — the
        backend is part of the closure, not ambient state."""
        import importlib

        from tmv_tpu.models.detector_harness import make_yolo_predict
        from tmv_tpu.models.yolo_v3 import YoloV3

        _nms = importlib.import_module("tmv_tpu.ops.nms")
        predict, variables, img = predictor
        size = img.shape[1]
        anchors = np.array(
            [[[116, 90], [156, 198], [373, 326]],
             [[30, 61], [62, 45], [59, 119]],
             [[10, 13], [16, 30], [33, 23]]], np.float32) * size / 416
        model = YoloV3(classes_num=3)
        pinned = make_yolo_predict(
            model, (size, size), anchors, 3, confidence_thresh=0.0,
            scores_thresh=0.0, iou_thresh=0.5, max_output_size=16,
            nms_backend="xla")
        prev = _nms._BACKEND
        _nms.set_nms_backend("pallas")
        try:
            # would fail on CPU if the closure honored the global: the
            # Pallas TPU kernel cannot lower for the host platform
            out = pinned(variables, img)
        finally:
            _nms.set_nms_backend(prev)
        assert_predictions_equal(predict(variables, img), out)


class TestInt8Export:
    def test_int8_static_artifact_matches_direct(self, tmp_path):
        """`export_model --int8Static` semantics: an artifact exported
        from the int8 predictor reproduces the direct int8 predict
        (quant collection baked in as constants)."""
        from tmv_tpu.models.detector_harness import make_yolo_predict
        from tmv_tpu.models.yolo_v3 import YoloV3
        from tmv_tpu.quant import (
            calibrate_model, prepare_static_int8_variables,
        )

        size = 64
        anchors = np.array(
            [[[116, 90], [156, 198], [373, 326]],
             [[30, 61], [62, 45], [59, 119]],
             [[10, 13], [16, 30], [33, 23]]], np.float32) * size / 416
        model = YoloV3(classes_num=3)
        v = model.init(jax.random.key(0), jnp.zeros((1, size, size, 3)),
                       train=False)
        v = {"params": jax.tree.map(lambda x: x * 0.2, v["params"]),
             "batch_stats": v["batch_stats"]}
        img = np.random.default_rng(0).uniform(
            size=(1, size, size, 3)).astype(np.float32)
        qv = prepare_static_int8_variables(
            v, calibrate_model(model, v, [jnp.asarray(img)], train=False))
        predict = make_yolo_predict(
            model, (size, size), anchors, 3, confidence_thresh=0.0,
            scores_thresh=0.0, max_output_size=16, quant="int8_static",
            nms_backend="xla")
        ref = predict(qv, img)

        path = str(tmp_path / "int8.tmvx")
        export_predictor(predict, qv, img, path=path, bake_variables=True,
                         platforms=("cpu",), meta={"quant": "int8_static"})
        loaded = load_predictor(path)
        out = loaded(None, img)
        assert_predictions_equal(ref, out, rtol=1e-5, atol=1e-5)
        assert read_export_meta(path)["quant"] == "int8_static"


class TestEfficientDetExport:
    """EfficientDet flows through the same artifact format + serving
    contract via `make_efficientdet_predict` (normalized-xyxy, 0-based
    class ids — the YOLO predictor contract)."""

    @pytest.fixture(scope="class")
    def ed_predictor(self):
        from tmv_tpu.models.efficientdet import (
            EfficientDetNet, get_efficientdet_config,
        )
        from tmv_tpu.models.efficientdet.harness import (
            make_efficientdet_predict,
        )
        from tmv_tpu.ops.anchors import Anchors

        cfg = get_efficientdet_config("efficientdet-d0")
        cfg.image_size = 64
        cfg.num_classes = 4  # 3 real classes + background
        cfg.levels_size = [64]
        for _ in range(cfg.max_level):
            cfg.levels_size.append((cfg.levels_size[-1] + 1) // 2)
        anchors = Anchors(cfg.min_level, cfg.max_level,
                          (cfg.image_size, cfg.image_size), cfg.num_scales,
                          cfg.aspect_ratios, cfg.anchor_scale)
        model = EfficientDetNet(config=cfg)
        variables = model.init(
            jax.random.key(0),
            jnp.zeros((1, cfg.image_size, cfg.image_size, 3)), train=False)
        predict = make_efficientdet_predict(model, anchors, cfg.image_size,
                                            score_threshold=-10.0,
                                            nms_backend="xla")
        rng = np.random.default_rng(0)
        img = rng.uniform(size=(1, 64, 64, 3)).astype(np.float32)
        return predict, variables, img

    def test_contract_shapes_and_ranges(self, ed_predictor):
        predict, variables, img = ed_predictor
        boxes, ids, scores, valid = predict(variables, img)
        assert boxes.shape[-1] == 4 and boxes.ndim == 2
        assert ids.shape == scores.shape == valid.shape
        v = np.asarray(valid)
        assert v.any()  # score_threshold=-10 keeps candidates
        b = np.asarray(boxes)[v]
        # random weights can decode boxes far outside the frame (exp(th)
        # blowups) — DetectionService clips after un-letterboxing; here
        # only finiteness and the normalized scale are contractual
        assert np.isfinite(b).all()
        assert np.median(np.abs(b)) < 3.0  # normalized scale, not pixels
        assert (np.asarray(ids)[v] >= 0).all()  # background removed

    def test_batched_predictor_matches_single(self, ed_predictor):
        """`make_efficientdet_predict_batched` (the micro-batch-queue
        predictor behind `serve --family efficientdet --batch N`) must
        match the single-image predictor row-for-row."""
        from tmv_tpu.models.efficientdet import (
            EfficientDetNet, get_efficientdet_config,
        )
        from tmv_tpu.models.efficientdet.harness import (
            make_efficientdet_predict_batched,
        )
        from tmv_tpu.ops.anchors import Anchors

        predict, variables, _ = ed_predictor
        cfg = get_efficientdet_config("efficientdet-d0")
        cfg.image_size = 64
        cfg.num_classes = 4
        cfg.levels_size = [64]
        for _ in range(cfg.max_level):
            cfg.levels_size.append((cfg.levels_size[-1] + 1) // 2)
        anchors = Anchors(cfg.min_level, cfg.max_level, (64, 64),
                          cfg.num_scales, cfg.aspect_ratios,
                          cfg.anchor_scale)
        model = EfficientDetNet(config=cfg)
        batched = make_efficientdet_predict_batched(
            model, anchors, 64, score_threshold=-10.0)
        rng = np.random.default_rng(1)
        imgs = jnp.asarray(rng.uniform(size=(3, 64, 64, 3))
                           .astype(np.float32))
        bb, bi, bs, bv = batched(variables, imgs)
        for j in range(3):
            ref = predict(variables, imgs[j:j + 1])
            assert_predictions_equal(
                ref, (bb[j], bi[j], bs[j], bv[j]), rtol=1e-5, atol=1e-5)

    def test_spatial_and_dp_sharding_match_single_device(self,
                                                         ed_predictor):
        """`serve --family efficientdet --spatial N` (height-sharded,
        the D6/D7x latency direction) and `--dp N` (batch-sharded) reuse
        the family-agnostic wrappers — outputs must match the unsharded
        program exactly on the 8-device CPU mesh."""
        from tmv_tpu.parallel.inference import (
            make_sharded_batched_predictor, make_spatial_predictor,
        )

        predict, variables, img = ed_predictor
        ref = predict(variables, img)
        sp_predict, sp_vars, mesh = make_spatial_predictor(
            predict, variables, 4)
        out = sp_predict(sp_vars, img)
        assert_predictions_equal(ref, out, rtol=1e-5, atol=1e-5)

        from tmv_tpu.models.efficientdet import (
            EfficientDetNet, get_efficientdet_config,
        )
        from tmv_tpu.models.efficientdet.harness import (
            make_efficientdet_predict_batched,
        )
        from tmv_tpu.ops.anchors import Anchors

        cfg = get_efficientdet_config("efficientdet-d0")
        cfg.image_size = 64
        cfg.num_classes = 4
        cfg.levels_size = [64]
        for _ in range(cfg.max_level):
            cfg.levels_size.append((cfg.levels_size[-1] + 1) // 2)
        anchors = Anchors(cfg.min_level, cfg.max_level, (64, 64),
                          cfg.num_scales, cfg.aspect_ratios,
                          cfg.anchor_scale)
        model = EfficientDetNet(config=cfg)
        batched = make_efficientdet_predict_batched(
            model, anchors, 64, score_threshold=-10.0)
        imgs = jnp.concatenate([img] * 4, axis=0)
        ref_b = batched(variables, imgs)
        dp_predict, dp_vars, _ = make_sharded_batched_predictor(
            batched, variables, 4)
        out_b = dp_predict(dp_vars, imgs)
        for j in range(4):
            assert_predictions_equal(
                tuple(t[j] for t in ref_b), tuple(t[j] for t in out_b),
                rtol=1e-5, atol=1e-5)

    def test_artifact_matches_live_and_serves(self, ed_predictor):
        predict, variables, img = ed_predictor
        ref = predict(variables, img)
        blob = export_predictor(predict, variables, img,
                                bake_variables=True,
                                platforms=("cpu",),
                                meta={"image_size": 64,
                                      "family": "efficientdet"})
        loaded = load_predictor(blob)
        out = loaded(None, img)
        assert_predictions_equal(ref, out, rtol=1e-5, atol=1e-5)

        service = DetectionService(loaded, None, ["a", "b", "c"], (64, 64))
        boxes, ids, scores = service.predict_prepared(
            np.asarray(img[0]), (64, 64), (0, 0, 0, 0))
        assert boxes.ndim == 2 and boxes.shape[1] == 4
