"""HTTP serving layer: the reference's detection endpoint, TPU-backed.

Capability parity with the Django app (`AIServer/ai_server/`,
`AIServer/ai_api/`): the route ``POST /ai_api/object_detection/predict``
(`ai_api/urls.py:7`) accepting ``{"img_data": "<base64 data-url>",
"read": 1}`` and returning ``{"boxes", "classes", "random_img",
"result_img"}`` (`views/object_detection.py:40-109`), plus the index view.

Re-design: a dependency-free WSGI app (runs under wsgiref, uWSGI, gunicorn —
the reference's `uwsgi.ini` deploy applies unchanged) around a warm jitted
predictor.  The model forward + NMS run on TPU; unletterboxing is the same
closed-form affine the view used (`views/object_detection.py:71-84`).
"""

import json
from typing import Callable, Optional

import numpy as np

from tmv_tpu.utils import image_helper as ImageHelper


class DetectionService:
    """Warm predictor wrapper: image array → (boxes, class_ids, scores)."""

    def __init__(self, predict_fn: Callable, variables, classes_name,
                 image_wh=(416, 416)):
        """predict_fn: jitted (variables, (1,H,W,3) float [0,1]) →
        (boxes_norm, classes_id, scores, valid)."""
        self.predict_fn = predict_fn
        self.variables = variables
        self.classes_name = classes_name
        self.image_wh = image_wh

    def predict_image(self, img_old: np.ndarray,
                      confidence_thresh: float = 0.5):
        image_size = np.int32(self.image_wh)
        img, _, padding = ImageHelper.proportional_resize(
            img_old, image_size, bg_color=(0, 0, 0)
        )
        width, height = ImageHelper.get_image_size(img_old)
        predict_img = img.astype(np.float32) / 255.0
        boxes, ids, scores, valid = self.predict_fn(
            self.variables, predict_img[None]
        )
        v = np.asarray(valid)
        y_boxes = np.asarray(boxes)[v]
        y_ids = np.asarray(ids)[v]
        y_scores = np.asarray(scores)[v]
        # un-letterbox: normalized boxes → original pixels
        # (views/object_detection.py:71-77)
        y_boxes[:, [0, 2]] = (
            (y_boxes[:, [0, 2]] * image_size[0] - padding[2])
            / (image_size[0] - padding[2] - padding[3]) * width
        )
        y_boxes[:, [1, 3]] = (
            (y_boxes[:, [1, 3]] * image_size[1] - padding[0])
            / (image_size[1] - padding[0] - padding[1]) * height
        )
        y_boxes[:, 0] = np.clip(y_boxes[:, 0], 0, None)
        y_boxes[:, 1] = np.clip(y_boxes[:, 1], 0, None)
        y_boxes[:, 2] = np.clip(y_boxes[:, 2], None, width)
        y_boxes[:, 3] = np.clip(y_boxes[:, 3], None, height)
        mask = ((y_boxes[:, 2] - y_boxes[:, 0] > 2)
                & (y_boxes[:, 3] - y_boxes[:, 1] > 2))
        return (y_boxes[mask].astype(np.int32), y_ids[mask], y_scores[mask],
                img)


def create_app(service: DetectionService):
    """WSGI application with the reference's URL + JSON contract."""

    def index(environ, start_response):
        body = b"tmv_tpu AIServer"
        start_response("200 OK", [("Content-Type", "text/plain")])
        return [body]

    def predict(environ, start_response):
        try:
            size = int(environ.get("CONTENT_LENGTH") or 0)
            request_data = json.loads(environ["wsgi.input"].read(size))
            img_data = request_data["img_data"].split(",")[1]
            img_bytes = ImageHelper.base64_to_bytes(img_data)
            img_old = ImageHelper.bytes_to_image(img_bytes)

            y_boxes, y_ids, y_scores, letterboxed = service.predict_image(
                img_old)
            labels = [service.classes_name[i] for i in y_ids]
            result_img = ImageHelper.draw_boxes(
                img_old, y_boxes, labels, y_scores)

            json_obj = {
                "boxes": y_boxes.tolist(),
                "classes": y_ids.tolist(),
                "random_img": ImageHelper.bytes_to_base64(
                    ImageHelper.image_to_bytes(letterboxed)),
                "result_img": ImageHelper.bytes_to_base64(
                    ImageHelper.image_to_bytes(result_img)),
            }
            body = json.dumps(json_obj).encode()
            start_response("200 OK", [("Content-Type", "application/json")])
            return [body]
        except Exception as e:  # noqa: BLE001 — surface as 500 JSON
            body = json.dumps({"error": str(e)}).encode()
            start_response("500 Internal Server Error",
                           [("Content-Type", "application/json")])
            return [body]

    def app(environ, start_response):
        path = environ.get("PATH_INFO", "/")
        if path == "/ai_api/object_detection/predict":
            return predict(environ, start_response)
        return index(environ, start_response)

    return app


def run_server(service: DetectionService, host: str = "0.0.0.0",
               port: int = 8000, threaded: bool = False):
    """``threaded=True`` serves each request on its own thread — required
    for the micro-batching queue (``serving/batching.py``) to ever see more
    than one in-flight request from a single dev server."""
    import socketserver
    from wsgiref.simple_server import WSGIServer, make_server

    cls = WSGIServer
    if threaded:
        class ThreadingWSGIServer(socketserver.ThreadingMixIn, WSGIServer):
            daemon_threads = True

        cls = ThreadingWSGIServer
    srv = make_server(host, port, create_app(service), server_class=cls)
    print(f"serving on http://{host}:{port}"
          + (" (threaded)" if threaded else ""))
    srv.serve_forever()
