"""End-to-end data-pipeline tests with synthetic on-disk datasets."""

import os

import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def detection_dataset(tmp_path_factory):
    """Synthetic detection dataset: colored rectangles on noise."""
    root = tmp_path_factory.mktemp("det")
    img_dir = root / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    lines = []
    for i in range(6):
        h, w = int(rng.integers(200, 400)), int(rng.integers(200, 400))
        img = rng.integers(0, 80, (h, w, 3), dtype=np.uint8)
        n = int(rng.integers(1, 4))
        items = []
        for _ in range(n):
            x1 = int(rng.integers(0, w - 60))
            y1 = int(rng.integers(0, h - 60))
            bw = int(rng.integers(30, 60))
            bh = int(rng.integers(30, 60))
            cls = "cat" if rng.uniform() < 0.5 else "dog"
            img[y1:y1 + bh, x1:x1 + bw] = (
                [200, 40, 40] if cls == "cat" else [40, 200, 40])
            items.append(f"{cls},{x1},{y1},{x1 + bw},{y1 + bh}")
        name = f"img{i}.jpg"
        Image.fromarray(img).save(img_dir / name)
        lines.append("|".join([name] + items) + "|")
    (root / "labels.txt").write_text("\n".join(lines) + "\n")
    (root / "classes.txt").write_text("cat\ndog\n")
    return root


ANCHORS = np.array(
    [[[116, 90], [156, 198], [373, 326]],
     [[30, 61], [62, 45], [59, 119]],
     [[10, 13], [16, 30], [33, 23]]], np.float32)


class TestYoloPipelineE2E:
    def test_batches_shape_and_targets(self, detection_dataset):
        from tmv_tpu.data.yolo_pipeline import YoloDataPipeline

        p = YoloDataPipeline(
            str(detection_dataset / "imgs"),
            str(detection_dataset / "labels.txt"),
            str(detection_dataset / "classes.txt"),
            batch_size=2, anchors=ANCHORS, image_wh=(160, 160),
        )
        assert p.classes_num == 2
        it = iter(p)
        batch = next(it)
        assert batch["image"].shape == (2, 160, 160, 3)
        img = np.asarray(batch["image"])
        assert img.min() >= 0.0 and img.max() <= 1.0
        assert len(batch["targets"]) == 3
        assert batch["targets"][0].shape == (2, 5, 5, 3, 7)
        total_pos = sum(float(np.asarray(t[..., 4]).sum())
                        for t in batch["targets"])
        assert total_pos >= 1  # aug can clip some boxes, not all

    def test_no_augment_deterministic_targets(self, detection_dataset):
        from tmv_tpu.data.yolo_pipeline import YoloDataPipeline

        p = YoloDataPipeline(
            str(detection_dataset / "imgs"),
            str(detection_dataset / "labels.txt"),
            str(detection_dataset / "classes.txt"),
            batch_size=2, anchors=ANCHORS, image_wh=(160, 160),
            image_random=False, label_mean=False,
        )
        batch = next(iter(p))
        total_pos = sum(float(np.asarray(t[..., 4]).sum())
                        for t in batch["targets"])
        assert total_pos >= 2


class TestEfficientDetPipelineE2E:
    def test_batches(self, detection_dataset):
        from tmv_tpu.data.efficientdet_pipeline import EfficientDetPipeline
        from tmv_tpu.ops.anchors import Anchors

        anchors = Anchors(3, 7, (128, 128), 3,
                          [(1.0, 1.0), (1.4, 0.7), (0.7, 1.4)], 4.0)
        p = EfficientDetPipeline(
            str(detection_dataset / "imgs"),
            str(detection_dataset / "labels.txt"),
            str(detection_dataset / "classes.txt"),
            batch_size=2, anchors=anchors, num_classes=3, image_size=128,
        )
        it = iter(p)
        batch = next(it)
        assert batch["image"].shape == (2, 128, 128, 3)
        assert len(batch["boxes"]) == 5
        assert batch["boxes"][0].shape == (2, 16, 16, 9, 4)
        assert batch["classes"][0].shape == (2, 16, 16, 9, 3)
        # positives exist and map to the shifted (background=0) class ids;
        # a single augmented batch can legitimately have none (boxes pushed
        # out of frame), so scan a few
        pos_classes = []
        for _ in range(4):
            for ct, m in zip(batch["classes"], batch["masks"]):
                ct, m = np.asarray(ct), np.asarray(m[..., 0])
                if m.any():
                    pos_classes.extend(ct[m].argmax(-1).tolist())
            if pos_classes:
                break
            batch = next(it)
        assert pos_classes and all(c in (1, 2) for c in pos_classes)


@pytest.mark.slow
class TestZeroForegroundWarning:
    def test_train_efficientdet_warns_on_anchor_mismatch(self, tmp_path,
                                                         monkeypatch,
                                                         capsys):
        """Anchor/box scale mismatch must not fail silently: with every
        GT box below IoU 0.5 against every anchor, all targets are
        background and mAP lands at exactly 0 — the CLI warns on the
        first batch and names the knobs."""
        import sys

        rng = np.random.default_rng(0)
        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        lines = []
        for i in range(4):
            arr = rng.integers(0, 60, (96, 96, 3)).astype(np.uint8)
            Image.fromarray(arr).save(img_dir / f"im{i}.jpg")
            lines.append(f"im{i}.jpg|a,10,10,16,16|")  # 6 px boxes
        (tmp_path / "labels.txt").write_text("\n".join(lines) + "\n")
        (tmp_path / "classes.txt").write_text("a\nb\n")

        argv = ["train_efficientdet", "--modelName", "efficientdet-d0",
                "--classesFile", str(tmp_path / "classes.txt"),
                "--trainData", str(tmp_path / "labels.txt"),
                "--trainImagePath", str(img_dir), "--imageSize", "64",
                "--batchSize", "4", "--stepsPerEpoch", "2",
                "--epochs", "1", "--modelPath", str(tmp_path / "w"),
                "--earlyStopPatience", "0"]
        monkeypatch.setattr(sys, "argv", argv)
        from tmv_tpu.cli import train_efficientdet

        train_efficientdet.main()
        assert "ZERO foreground" in capsys.readouterr().out
