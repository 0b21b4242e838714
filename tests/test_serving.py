"""Serving contract test: exercise the WSGI app with the reference's JSON
request/response schema, using a stub predictor (no heavy model)."""

import base64
import io
import json

import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image

from tmv_tpu.serving.app import DetectionService, create_app


def fake_predict(variables, image):
    # one confident box covering the center of the letterboxed image
    boxes = jnp.asarray(np.array(
        [[0.25, 0.25, 0.75, 0.75]] + [[0, 0, 0, 0]] * 4, np.float32))
    ids = jnp.asarray(np.array([1, 0, 0, 0, 0], np.int32))
    scores = jnp.asarray(np.array([0.9, 0, 0, 0, 0], np.float32))
    valid = jnp.asarray(np.array([True, False, False, False, False]))
    return boxes, ids, scores, valid


@pytest.fixture
def app():
    service = DetectionService(fake_predict, {}, ["bg", "cat", "dog"])
    return create_app(service)


def wsgi_post(app, path, payload):
    body = json.dumps(payload).encode()
    status_headers = {}

    def start_response(status, headers):
        status_headers["status"] = status
        status_headers["headers"] = headers

    environ = {
        "PATH_INFO": path,
        "REQUEST_METHOD": "POST",
        "CONTENT_LENGTH": str(len(body)),
        "wsgi.input": io.BytesIO(body),
    }
    chunks = app(environ, start_response)
    return status_headers["status"], b"".join(chunks)


class TestDetectionEndpoint:
    def make_data_url(self):
        img = np.zeros((100, 200, 3), np.uint8)
        img[25:75, 50:150] = [255, 0, 0]
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "JPEG")
        b64 = base64.b64encode(buf.getvalue()).decode()
        return f"data:image/jpeg;base64,{b64}"

    def test_predict_contract(self, app):
        status, body = wsgi_post(
            app, "/ai_api/object_detection/predict",
            {"img_data": self.make_data_url(), "read": 1})
        assert status.startswith("200")
        out = json.loads(body)
        assert set(out.keys()) == {"boxes", "classes", "random_img",
                                   "result_img"}
        assert out["classes"] == [1]
        # one box, unletterboxed into 200×100 original pixel space
        assert len(out["boxes"]) == 1
        x1, y1, x2, y2 = out["boxes"][0]
        assert 0 <= x1 < x2 <= 200 and 0 <= y1 < y2 <= 100
        # returned images decode as JPEG
        for key in ("random_img", "result_img"):
            raw = base64.b64decode(out[key])
            im = Image.open(io.BytesIO(raw))
            assert im.size[0] > 0

    def test_index_route(self, app):
        status, body = wsgi_post(app, "/", {})
        assert status.startswith("200")

    def test_malformed_request_returns_500(self, app):
        status, body = wsgi_post(
            app, "/ai_api/object_detection/predict", {"read": 1})
        assert status.startswith("500")
        assert "error" in json.loads(body)


class TestCliImports:
    def test_cli_modules_importable(self):
        import tmv_tpu.cli.train_yolo
        import tmv_tpu.cli.train_unet
        import tmv_tpu.cli.train_efficientdet
        import tmv_tpu.cli.train_facenet
        import tmv_tpu.cli.train_moco
        import tmv_tpu.cli.serve


class TestServeFlagValidation:
    """serve.py must reject silently-ignored flag combinations up front."""

    def _parse(self, argv):
        import sys

        from tmv_tpu.cli.serve import parse_args

        old = sys.argv
        sys.argv = ["serve"] + argv
        try:
            return parse_args()
        finally:
            sys.argv = old

    def test_artifact_rejects_int8_batch_bf16(self):
        for extra in (["--int8"], ["--batch", "4"], ["--bf16"]):
            with pytest.raises(SystemExit):
                self._parse(["--classesFile", "c.txt",
                             "--artifact", "m.tmvx"] + extra)

    def test_int8_with_batch_rejected(self):
        with pytest.raises(SystemExit):
            self._parse(["--classesFile", "c.txt", "--anchorsFile", "a.txt",
                         "--int8", "--batch", "4"])

    def test_int8_static_exclusions(self):
        with pytest.raises(SystemExit):
            self._parse(["--classesFile", "c.txt", "--anchorsFile", "a.txt",
                         "--int8", "--int8Static", "calib/"])
        # dynamic int8 stays batch-1-only; STATIC int8 composes with the
        # micro-batch queue (r3) — must parse
        with pytest.raises(SystemExit):
            self._parse(["--classesFile", "c.txt", "--anchorsFile", "a.txt",
                         "--int8", "--batch", "4"])
        args = self._parse(["--classesFile", "c.txt", "--anchorsFile",
                            "a.txt", "--int8Static", "calib/",
                            "--batch", "4"])
        assert args.int8Static == "calib/" and args.batch == 4
        with pytest.raises(SystemExit):
            self._parse(["--classesFile", "c.txt",
                         "--artifact", "m.tmvx", "--int8Static", "calib/"])

    def test_efficientdet_family_flags(self):
        # no anchors file needed; batching/dp/spatial compose
        args = self._parse(["--classesFile", "c.txt",
                            "--family", "efficientdet", "--batch", "4"])
        assert args.family == "efficientdet" and args.batch == 4
        args = self._parse(["--classesFile", "c.txt", "--family",
                            "efficientdet", "--batch", "4", "--dp", "2"])
        assert args.dp == 2
        args = self._parse(["--classesFile", "c.txt", "--family",
                            "efficientdet", "--imageSize", "512",
                            "--spatial", "4"])
        assert args.spatial == 4
        # int8 is yolo-family only (measured loss on D0, PARITY §6);
        # bad dp/spatial combos rejected up front
        for extra in (["--int8"], ["--int8Static", "calib/"],
                      ["--dp", "2"],                      # dp needs batch
                      ["--batch", "4", "--spatial", "2"],  # latency vs tput
                      ["--imageSize", "65", "--spatial", "2"]):
            with pytest.raises(SystemExit):
                self._parse(["--classesFile", "c.txt",
                             "--family", "efficientdet"] + extra)

    def test_dp_flag_validation(self):
        with pytest.raises(SystemExit):  # dp needs batching
            self._parse(["--classesFile", "c.txt", "--anchorsFile", "a.txt",
                         "--dp", "4"])
        with pytest.raises(SystemExit):  # batch must divide
            self._parse(["--classesFile", "c.txt", "--anchorsFile", "a.txt",
                         "--batch", "6", "--dp", "4"])
        with pytest.raises(SystemExit):  # artifact pins its own program
            self._parse(["--classesFile", "c.txt", "--artifact", "m.tmvx",
                         "--dp", "4"])
        args = self._parse(["--classesFile", "c.txt", "--anchorsFile",
                            "a.txt", "--batch", "8", "--dp", "4"])
        assert args.dp == 4

    def test_anchors_required_without_artifact(self):
        with pytest.raises(SystemExit):
            self._parse(["--classesFile", "c.txt"])

    def test_artifact_without_anchors_ok(self):
        args = self._parse(["--classesFile", "c.txt",
                            "--artifact", "m.tmvx"])
        assert args.artifact == "m.tmvx" and args.anchorsFile is None


class TestServeCalibration:
    def test_calibrate_bakes_quant_collection(self, rng, tmp_path):
        import jax
        import jax.numpy as jnp
        from PIL import Image as PILImage

        from tmv_tpu.cli.serve import _calibrate
        from tmv_tpu.models.yolo_v3 import YoloV3

        for i in range(2):
            PILImage.fromarray(
                rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
            ).save(tmp_path / f"im{i}.jpg")
        model = YoloV3(classes_num=2)
        size = 64
        v = model.init(jax.random.key(0), jnp.zeros((1, size, size, 3)),
                       train=False)
        qv = _calibrate(model, v, str(tmp_path), (size, size))
        assert "quant" in qv
        leaves = jax.tree_util.tree_leaves(qv["quant"])
        assert leaves and all(
            np.isfinite(np.asarray(x, np.float32)).all() for x in leaves)


class TestMicroBatcher:
    """Micro-batching queue (`serving/batching.py`): concurrent requests
    share one batched predict call; results route back per-request."""

    def _make_batcher(self, max_batch=8, max_wait_ms=1.0, lock=None):
        from tmv_tpu.serving.batching import MicroBatcher

        def batched_predict(_variables, images):
            if lock is not None:
                with lock:
                    pass
            # per-image signature values so routing errors are detectable
            return (images.sum(axis=(1, 2, 3)), images[:, 0, 0, 0])

        return MicroBatcher(batched_predict, {}, max_batch=max_batch,
                            max_wait_ms=max_wait_ms)

    def test_results_route_to_the_right_request(self):
        import threading

        lock = threading.Lock()
        batcher = self._make_batcher(lock=lock)
        images = [np.full((4, 4, 3), i, np.float32) for i in range(8)]
        results = [None] * 8
        # hold the predictor so later requests pile up into one batch
        lock.acquire()

        def call(i):
            results[i] = batcher.predict_one(images[i])

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(8)]
        for t in threads:
            t.start()
        import time

        time.sleep(0.3)  # let every request enqueue while blocked
        lock.release()
        for t in threads:
            t.join(timeout=10)
        for i, (total, corner) in enumerate(results):
            assert total == pytest.approx(4 * 4 * 3 * i)
            assert corner == pytest.approx(float(i))
        assert sum(batcher.batch_sizes) == 8
        assert len(batcher.batch_sizes) <= 4  # batching actually happened
        batcher.close()

    def test_as_predict_fn_adapter(self):
        batcher = self._make_batcher()
        out = batcher.as_predict_fn()({}, np.ones((1, 2, 2, 3), np.float32))
        assert out[0] == pytest.approx(12.0)
        batcher.close()

    def test_predictor_error_propagates(self):
        from tmv_tpu.serving.batching import MicroBatcher

        def boom(_v, _images):
            raise ValueError("kernel on fire")

        batcher = MicroBatcher(boom, {}, max_batch=2)
        with pytest.raises(ValueError, match="kernel on fire"):
            batcher.predict_one(np.zeros((2, 2, 3), np.float32))
        batcher.close()

    def test_bad_shape_fails_request_not_collector(self):
        """A wrong-shaped image must fail its own future; the collector
        thread survives and keeps serving later requests."""
        import threading

        import time

        lock = threading.Lock()
        batcher = self._make_batcher(max_batch=4, lock=lock)
        errs, oks = [], []

        def bad():
            try:
                batcher.predict_one(np.zeros((5, 5, 3), np.float32))
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        def good():
            oks.append(batcher.predict_one(np.ones((4, 4, 3), np.float32)))

        # primer occupies the collector inside batched_predict (blocked on
        # the lock) so the good+bad pair below lands in ONE batch
        lock.acquire()
        primer = threading.Thread(target=good)
        primer.start()
        time.sleep(0.2)
        t1 = threading.Thread(target=good)
        t1.start()
        time.sleep(0.1)
        t2 = threading.Thread(target=bad)
        t2.start()
        time.sleep(0.1)
        lock.release()
        primer.join(timeout=10)
        t1.join(timeout=10)
        t2.join(timeout=10)
        # the mismatched request raised; the well-formed ones resolved
        assert len(errs) == 1 and isinstance(errs[0], ValueError)
        assert len(oks) == 2
        assert all(o[0] == pytest.approx(4 * 4 * 3) for o in oks)
        # collector still alive: a fresh request succeeds
        out = batcher.predict_one(np.ones((4, 4, 3), np.float32))
        assert out[0] == pytest.approx(4 * 4 * 3)
        batcher.close()


class TestBatchedPredictEquivalence:
    """`make_yolo_predict_batched` slices must match the single-image
    predictor exactly (same forward, vmapped decode+NMS)."""

    class _StubDetector:
        """Deterministic per-image 'model': images → 3-scale YOLO heads via
        pooling/elementwise ops only, so batched and single forwards are
        numerically identical (a real conv net's batch-1 vs batch-N XLA
        layouts differ in the last float digits, which random-init garbage
        activations then amplify — that would test nothing)."""

        def __init__(self, size, classes_num):
            self.size = size
            self.classes_num = classes_num

        def apply(self, _variables, images, train=False):
            heads = []
            for grid in (self.size // 32, self.size // 16, self.size // 8):
                cell = self.size // grid
                b = images.shape[0]
                x = images.reshape(b, grid, cell, grid, cell, 3)
                x = x.mean(axis=(2, 4))  # (B, g, g, 3)
                feats = 3 * (5 + self.classes_num)
                chans = [jnp.tanh(x.mean(-1) * (0.15 * c - 1.0))
                         for c in range(feats)]
                h = jnp.stack(chans, axis=-1).reshape(
                    b, grid, grid, 3, 5 + self.classes_num)
                heads.append(h)
            return heads

    def test_matches_single_image_predict(self):
        from tmv_tpu.models.detector_harness import (
            make_yolo_predict, make_yolo_predict_batched,
        )

        size = 64
        anchors = np.array(
            [[[116, 90], [156, 198], [373, 326]],
             [[30, 61], [62, 45], [59, 119]],
             [[10, 13], [16, 30], [33, 23]]], np.float32) * size / 416
        model = self._StubDetector(size, 3)
        kw = dict(confidence_thresh=0.0, scores_thresh=0.0, iou_thresh=0.5,
                  max_output_size=8)
        single = make_yolo_predict(model, (size, size), anchors, 3, **kw)
        batched = make_yolo_predict_batched(
            model, (size, size), anchors, 3, **kw)

        rng = np.random.default_rng(7)
        images = rng.uniform(size=(3, size, size, 3)).astype(np.float32)
        b_out = [np.asarray(o)
                 for o in batched({}, jnp.asarray(images))]
        assert np.asarray(b_out[3]).any(), "stub produced no detections"
        for i in range(3):
            s_out = [np.asarray(o)
                     for o in single({}, jnp.asarray(images[i:i + 1]))]
            for got, want in zip((o[i] for o in b_out), s_out):
                np.testing.assert_allclose(got, want, atol=1e-6)


class TestServingRealModel:
    """End-to-end through a real tiny YoloV4 predictor (VERDICT r1 weak #6):
    catches letterbox/un-letterbox drift that the stub contract test can't."""

    @pytest.fixture(scope="class")
    def real_service(self):
        import jax

        from tmv_tpu.models.detector_harness import make_yolo_predict
        from tmv_tpu.models.yolo_v4 import YoloV4

        size = 64
        anchors = np.array(
            [[[116, 90], [156, 198], [373, 326]],
             [[30, 61], [62, 45], [59, 119]],
             [[10, 13], [16, 30], [33, 23]]], np.float32) * size / 416
        model = YoloV4(classes_num=3)
        variables = model.init(
            jax.random.key(3), jnp.zeros((1, size, size, 3)), train=False)
        # thresholds 0: random weights still yield detections to map back
        predict = make_yolo_predict(
            model, (size, size), anchors, 3, confidence_thresh=0.0,
            scores_thresh=0.0, iou_thresh=0.5, iou_type="diou",
            max_output_size=16)
        return DetectionService(predict, variables, ["a", "b", "c"],
                                image_wh=(size, size))

    def _image(self, w=96, h=48):
        return np.asarray(
            np.random.default_rng(1).integers(0, 255, (h, w, 3)),
            np.uint8)

    def test_endpoint_end_to_end(self, real_service):
        app = create_app(real_service)
        img = self._image()
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "JPEG")
        b64 = base64.b64encode(buf.getvalue()).decode()
        status, body = wsgi_post(
            app, "/ai_api/object_detection/predict",
            {"img_data": f"data:image/jpeg;base64,{b64}", "read": 1})
        assert status.startswith("200")
        out = json.loads(body)
        assert set(out) == {"boxes", "classes", "random_img", "result_img"}
        assert len(out["boxes"]) > 0
        for x1, y1, x2, y2 in out["boxes"]:
            assert 0 <= x1 <= x2 <= 96 and 0 <= y1 <= y2 <= 48

    def test_unletterbox_matches_independent_affine(self, real_service):
        """Map the service's returned pixel boxes *forward* through an
        independently-written letterbox transform and compare with the raw
        normalized predictor outputs."""
        img = self._image()
        boxes_px, ids, scores, letterboxed = real_service.predict_image(img)
        assert len(boxes_px) > 0

        raw_boxes, raw_ids, raw_scores, raw_valid = real_service.predict_fn(
            real_service.variables,
            (letterboxed.astype(np.float32) / 255.0)[None])
        raw = np.asarray(raw_boxes)[np.asarray(raw_valid)]

        # independent letterbox geometry for a 96x48 image into 64x64:
        # ratio = max(96/64, 48/64) = 1.5 → content 64x32, pad_top 16
        scale_x, scale_y = 96 / 64.0, 48 / 32.0
        pad_top, pad_left = 16, 0
        expected = []
        for bx in raw:
            x1 = (bx[0] * 64 - pad_left) * scale_x / 1.0
            x2 = (bx[2] * 64 - pad_left) * scale_x / 1.0
            y1 = (bx[1] * 64 - pad_top) * scale_y / 1.0
            y2 = (bx[3] * 64 - pad_top) * scale_y / 1.0
            x1, x2 = np.clip([x1, x2], 0, 96)
            y1, y2 = np.clip([y1, y2], 0, 48)
            if x2 - x1 > 2 and y2 - y1 > 2:
                expected.append([x1, y1, x2, y2])
        expected = np.asarray(expected, np.float32)
        assert expected.shape[0] == boxes_px.shape[0]
        np.testing.assert_allclose(
            boxes_px.astype(np.float32), expected, atol=1.01)


class TestOpsEndpoints:
    """r3 operational surface: /healthz and /stats."""

    def test_healthz(self, app):
        status, body = wsgi_post(app, "/healthz", {})
        assert status.startswith("200")
        assert json.loads(body) == {"status": "ok"}

    def test_stats_counts_requests_and_latency(self, app):
        img = np.zeros((64, 64, 3), np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "JPEG")
        data_url = ("data:image/jpeg;base64,"
                    + base64.b64encode(buf.getvalue()).decode())
        for _ in range(3):
            status, _ = wsgi_post(
                app, "/ai_api/object_detection/predict",
                {"img_data": data_url, "read": 0})
            assert status.startswith("200")
        status, body = wsgi_post(
            app, "/ai_api/object_detection/stats", {})
        assert status.startswith("200")
        stats = json.loads(body)
        assert stats["requests"] == 3
        assert stats["latency_ms_p50"] > 0
        assert stats["latency_ms_p99"] >= stats["latency_ms_p50"]

    def test_read_zero_skips_image_payloads(self, app):
        img = np.zeros((64, 64, 3), np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "JPEG")
        data_url = ("data:image/jpeg;base64,"
                    + base64.b64encode(buf.getvalue()).decode())
        status, body = wsgi_post(
            app, "/ai_api/object_detection/predict",
            {"img_data": data_url, "read": 0})
        assert status.startswith("200")
        out = json.loads(body)
        assert out["random_img"] == "" and out["result_img"] == ""
        assert out["boxes"]  # detection still returned
        # default (read omitted) keeps the reference behavior
        status, body = wsgi_post(
            app, "/ai_api/object_detection/predict",
            {"img_data": data_url})
        out = json.loads(body)
        assert out["random_img"] and out["result_img"]
