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
