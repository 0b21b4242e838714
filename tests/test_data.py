import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tmv_tpu.data.samplers import ClassBalancedSampler
from tmv_tpu.data.yolo_targets import make_yolo_targets, pad_labels
from tmv_tpu.data.image_ops import (
    rgb_to_hsv, hsv_to_rgb, resize_with_pad, flip_boxes_lr, unletterbox_boxes,
)

ANCHORS = np.array(
    [[[116, 90], [156, 198], [373, 326]],
     [[30, 61], [62, 45], [59, 119]],
     [[10, 13], [16, 30], [33, 23]]], np.float32)


class TestSampler:
    def test_round_robin_class_balance(self):
        labels = [
            {"image_path": "a", "classes": [0], "boxes": np.zeros((1, 4))},
            {"image_path": "b", "classes": [1], "boxes": np.zeros((1, 4))},
            {"image_path": "c", "classes": [0, 1], "boxes": np.zeros((2, 4))},
        ]
        s = ClassBalancedSampler(labels, label_mean=True, seed=0)
        it = iter(s)
        seen = [next(it)["image_path"] for _ in range(60)]
        # both classes must appear with balanced frequency
        count0 = sum(1 for p in seen if p in ("a", "c"))
        assert 20 <= count0 <= 60

    def test_no_balance_passthrough(self):
        labels = [{"image_path": str(i), "classes": [0],
                   "boxes": np.zeros((1, 4))} for i in range(5)]
        s = ClassBalancedSampler(labels, label_mean=False, seed=0)
        it = iter(s)
        seen = {next(it)["image_path"] for _ in range(10)}
        assert seen == {str(i) for i in range(5)}


class TestYoloTargets:
    def test_box_lands_in_right_cell(self):
        boxes, classes, valid = pad_labels(
            np.array([[100.0, 150.0, 300.0, 350.0]], np.float32), [2], 10)
        targets = make_yolo_targets(
            jnp.asarray(boxes), jnp.asarray(classes), jnp.asarray(valid),
            ANCHORS, (416, 416), 4)
        total = sum(float(np.asarray(t[..., 4]).sum()) for t in targets)
        assert total == 1.0
        # box wh = (200,200): best anchor is (156,198) → scale 0, anchor 1
        t0 = np.asarray(targets[0])
        ys, xs, anchors = np.nonzero(t0[..., 4])
        assert anchors[0] == 1
        # center (200, 250) → cell (float-floor(200)/416*13, …) = (6, 7)
        assert (ys[0], xs[0]) == (7, 6)
        # one-hot class
        assert t0[ys[0], xs[0], anchors[0], 5 + 2] == 1.0

    def test_collision_dedup(self):
        # two identical boxes collide in one cell → zeroed out
        b = np.array([[100.0, 150.0, 300.0, 350.0]] * 2, np.float32)
        boxes, classes, valid = pad_labels(b, [1, 2], 10)
        targets = make_yolo_targets(
            jnp.asarray(boxes), jnp.asarray(classes), jnp.asarray(valid),
            ANCHORS, (416, 416), 4)
        total = sum(float(np.asarray(t[..., 4]).sum()) for t in targets)
        assert total == 0.0

    def test_invalid_boxes_ignored(self):
        boxes, classes, valid = pad_labels(np.zeros((0, 4), np.float32), [], 10)
        targets = make_yolo_targets(
            jnp.asarray(boxes), jnp.asarray(classes), jnp.asarray(valid),
            ANCHORS, (416, 416), 4)
        for t in targets:
            assert float(np.asarray(t).sum()) == 0.0


class TestImageOps:
    def test_hsv_roundtrip(self, rng):
        img = rng.uniform(size=(8, 8, 3)).astype(np.float32)
        out = np.asarray(hsv_to_rgb(rgb_to_hsv(jnp.asarray(img))))
        np.testing.assert_allclose(out, img, atol=1e-5)

    def test_resize_with_pad_geometry(self):
        img = jnp.ones((100, 200, 3))
        out, ph, pw, rh, rw, ratio = resize_with_pad(img, 416, 416)
        assert out.shape == (416, 416, 3)
        assert ratio == pytest.approx(200 / 416)
        assert rw == 416 and rh == int(np.floor(100 / (200 / 416)))
        # content is centered vertically
        col = np.asarray(out[:, 208, 0])
        assert col[ph + 1] == pytest.approx(1.0)
        assert col[ph - 1] == pytest.approx(0.0)

    def test_unletterbox_roundtrip(self):
        # a box placed in letterboxed 416² maps back to original coords
        orig_w, orig_h = 200, 100
        ratio, pad_h, pad_w, nh, nw = 200 / 416, (416 - 208) // 2, 0, 208, 416
        boxes = jnp.asarray(np.array([[0.25, 0.5, 0.75, 0.7]], np.float32))
        out = np.asarray(unletterbox_boxes(
            boxes, ratio, pad_w, pad_h, orig_w, orig_h,
            normalized_size=(416, 416)))
        np.testing.assert_allclose(
            out[0], [0.25 * 416 * ratio, (0.5 * 416 - pad_h) * ratio,
                     0.75 * 416 * ratio, (0.7 * 416 - pad_h) * ratio],
            rtol=1e-5)
        # a box extending into the bottom padding clips to the image height
        deep = jnp.asarray(np.array([[0.25, 0.5, 0.75, 0.95]], np.float32))
        out2 = np.asarray(unletterbox_boxes(
            deep, ratio, pad_w, pad_h, orig_w, orig_h,
            normalized_size=(416, 416)))
        assert out2[0, 3] == pytest.approx(orig_h)

    def test_flip_boxes(self):
        b = jnp.asarray(np.array([[10.0, 20.0, 30.0, 40.0]], np.float32))
        out = np.asarray(flip_boxes_lr(b, 100.0))
        np.testing.assert_allclose(out[0], [70.0, 20.0, 90.0, 40.0])
