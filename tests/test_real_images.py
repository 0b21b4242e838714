"""Real-photo smoke (round-3 item 5): the 10 real JPEGs shipped with the
reference (`/root/reference/AIServer/train_data`, real camera photos of
real sizes) must flow clean through the YOLO and EfficientDet data
pipelines, the detect CLI, and the serving decode→letterbox→predict→draw
path.  Until r4 only the UNet demo consumed them (`tools/e2e_unet_demo.py`)
— synthetic rectangles can't catch odd-size/EXIF/JPEG-artifact issues."""

import json
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
from PIL import Image

REAL_DIR = "/root/reference/AIServer/train_data"
JSON_DIR = os.path.join(REAL_DIR, "json")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REAL_DIR),
                       reason="reference train_data not present"),
]

ANCHORS = np.array(
    [[[116, 90], [156, 198], [373, 326]],
     [[30, 61], [62, 45], [59, 119]],
     [[10, 13], [16, 30], [33, 23]]], np.float32)


@pytest.fixture(scope="module")
def real_dataset(tmp_path_factory):
    """Label file over the real photos; boxes = labelme corner hulls.

    The reference labels these photos with 4-corner quadrilaterals (one
    per document region); the axis-aligned hull of each quad is a real,
    plausibly-placed detection box."""
    root = tmp_path_factory.mktemp("realset")
    lines = []
    for name in sorted(os.listdir(REAL_DIR)):
        if not name.endswith(".jpg"):
            continue
        jpath = os.path.join(JSON_DIR, name[:-4] + ".json")
        items = []
        if os.path.exists(jpath):
            with open(jpath) as f:
                meta = json.load(f)
            for shape in meta.get("shapes", []):
                pts = np.asarray(shape["points"], np.float32)
                x1, y1 = pts.min(axis=0)
                x2, y2 = pts.max(axis=0)
                items.append(f"doc,{x1:.0f},{y1:.0f},{x2:.0f},{y2:.0f}")
        if items:
            lines.append("|".join([name] + items) + "|")
    assert len(lines) >= 8, "expected the 10 real labelled photos"
    (root / "labels.txt").write_text("\n".join(lines) + "\n")
    (root / "classes.txt").write_text("doc\n")
    return root


class TestRealPhotoPipelines:
    def test_yolo_pipeline_stages_real_photos(self, real_dataset):
        from tmv_tpu.data.yolo_pipeline import YoloDataPipeline

        p = YoloDataPipeline(
            REAL_DIR, str(real_dataset / "labels.txt"),
            str(real_dataset / "classes.txt"),
            batch_size=4, anchors=ANCHORS, image_wh=(160, 160),
            image_random=False, label_mean=False,
        )
        batch = next(iter(p))
        img = np.asarray(batch["image"])
        assert img.shape == (4, 160, 160, 3)
        assert np.isfinite(img).all() and img.min() >= 0 and img.max() <= 1
        assert img.std() > 0.01  # real photo content survived decode
        total_pos = sum(float(np.asarray(t[..., 4]).sum())
                        for t in batch["targets"])
        assert total_pos >= 1

    def test_efficientdet_pipeline_stages_real_photos(self, real_dataset):
        from tmv_tpu.data.efficientdet_pipeline import EfficientDetPipeline
        from tmv_tpu.ops.anchors import Anchors

        anchors = Anchors(3, 7, (128, 128), 3,
                          [(1.0, 1.0), (1.4, 0.7), (0.7, 1.4)], 4.0)
        p = EfficientDetPipeline(
            REAL_DIR, str(real_dataset / "labels.txt"),
            str(real_dataset / "classes.txt"),
            batch_size=4, anchors=anchors, num_classes=2, image_size=128,
            augment=False,
        )
        batch = next(iter(p))
        img = np.asarray(batch["image"])
        assert img.shape == (4, 128, 128, 3)
        assert np.isfinite(img).all()
        assert img.std() > 0.01
        any_pos = any(bool(np.asarray(m).any()) for m in batch["masks"])
        assert any_pos  # the labelme hulls assign foreground anchors


class TestRealPhotoDetectCLI:
    def _run_detect(self, argv):
        from tmv_tpu.cli.detect import main

        old = sys.argv
        sys.argv = ["detect"] + argv
        try:
            main()
        finally:
            sys.argv = old

    @pytest.mark.parametrize("family", ["yolo", "efficientdet"])
    def test_detect_cli_on_real_photo(self, real_dataset, tmp_path, family):
        """decode → letterbox → predict → unletterbox → draw → write, on a
        real photo, through the actual CLI (random weights, thresholds 0 so
        boxes come back and the draw path runs)."""
        from tmv_tpu.core.checkpoint import CheckpointManager
        from tmv_tpu.core.train_state import TrainState

        size = 64
        if family == "yolo":
            from tmv_tpu.models.yolo_v4 import YoloV4

            model = YoloV4(classes_num=1)
            anchors_txt = ("10,13, 16,30, 33,23, 30,61, 62,45, 59,119, "
                           "116,90, 156,198, 373,326")
            (tmp_path / "anchors.txt").write_text(anchors_txt + "\n")
        else:
            from tmv_tpu.core.config import Config
            from tmv_tpu.models.efficientdet import (
                EfficientDetNet, get_efficientdet_config,
            )

            cfg = get_efficientdet_config("efficientdet-d0")
            cfg.num_classes = 2  # 1 class + background
            cfg.image_size = size
            cfg.levels_size = [size]
            for _ in range(cfg.max_level):
                cfg.levels_size.append((cfg.levels_size[-1] + 1) // 2)
            model = EfficientDetNet(config=cfg)

        variables = model.init(jax.random.key(0),
                               jnp.zeros((1, size, size, 3)), train=False)
        state = TrainState.create(variables["params"],
                                  variables["batch_stats"],
                                  optax.sgd(1e-3))
        ckpt = tmp_path / f"ckpt_{family}"
        mgr = CheckpointManager(str(ckpt))
        mgr.save(0, state, force=True)
        mgr.close()

        image = os.path.join(REAL_DIR, "img (3).jpg")
        out = tmp_path / "result.jpg"
        argv = [
            "--image", image, "--out", str(out),
            "--modelPath", str(ckpt),
            "--classesFile", str(real_dataset / "classes.txt"),
            "--family", family, "--imageSize", str(size),
            "--confidenceThresh", "0.0", "--scoresThresh", "0.0",
        ]
        if family == "yolo":
            argv += ["--anchorsFile", str(tmp_path / "anchors.txt")]
        self._run_detect(argv)
        assert out.exists()
        w0, h0 = Image.open(image).size
        w1, h1 = Image.open(out).size
        assert (w1, h1) == (w0, h0)  # drawn at the original resolution


class TestRealPhotoServing:
    def test_serving_path_on_real_photo(self):
        """DetectionService.predict_image on a real photo at its native
        size: boxes map back inside the original frame."""
        from tmv_tpu.models.detector_harness import make_yolo_predict
        from tmv_tpu.models.yolo_v4 import YoloV4
        from tmv_tpu.serving.app import DetectionService
        from tmv_tpu.utils import image_helper

        size = 64
        model = YoloV4(classes_num=1)
        variables = model.init(jax.random.key(1),
                               jnp.zeros((1, size, size, 3)), train=False)
        anchors = ANCHORS * size / 416
        predict = make_yolo_predict(
            model, (size, size), anchors, 1, confidence_thresh=0.0,
            scores_thresh=0.0, iou_thresh=0.5, iou_type="diou",
            max_output_size=16)
        service = DetectionService(predict, variables, ["doc"],
                                   image_wh=(size, size))

        path = os.path.join(REAL_DIR, "img (0).jpg")
        img = image_helper.bytes_to_image(open(path, "rb").read())
        h, w = img.shape[:2]
        assert min(h, w) > 100  # a real photo, not a fixture
        boxes, ids, scores, _ = service.predict_image(img)
        assert len(boxes) > 0
        for x1, y1, x2, y2 in np.asarray(boxes, np.float32):
            assert 0 <= x1 <= x2 <= w and 0 <= y1 <= y2 <= h
        drawn = image_helper.draw_boxes(
            img, boxes, ["doc"] * len(boxes), scores)
        assert drawn.shape == img.shape
