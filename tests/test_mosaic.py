"""Device-side mosaic augmentation: geometry (points tracked through the
composite), content placement, capacity compaction, and pipeline wiring."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# compile-heavy; device mosaic is a beyond-reference capability, not a
# parity oracle
pytestmark = pytest.mark.slow

from tmv_tpu.data.mosaic import mosaic_batch


def solid(color, h=64, w=64):
    img = np.zeros((h, w, 3), np.float32)
    img[...] = color
    return img


class TestMosaicGeometry:
    def test_boxes_track_quadrant_affines(self):
        """With explicit partners/centers every box lands at the closed-form
        affine image of its source box."""
        h = w = 64
        images = jnp.asarray(np.stack([solid(c) for c in
                                       [(255, 0, 0), (0, 255, 0),
                                        (0, 0, 255), (255, 255, 0)]]))
        # one box per source image
        src_boxes = np.array([
            [[8, 8, 40, 24]],
            [[0, 0, 64, 64]],
            [[16, 32, 48, 40]],
            [[10, 20, 30, 60]],
        ], np.float32)
        boxes = jnp.asarray(src_boxes)
        classes = jnp.asarray(np.arange(4, dtype=np.int32)[:, None])
        valid = jnp.ones((4, 1), bool)
        partners = jnp.asarray(np.array(
            [[1, 2, 3, 0], [2, 3, 0, 1], [3, 0, 1, 2]], np.int32))
        cx, cy = 24.0, 40.0
        centers = jnp.asarray(np.tile([[cx, cy]], (4, 1)).astype(np.float32))

        out_img, out_boxes, out_classes, out_valid = mosaic_batch(
            images, boxes, classes, valid, jax.random.key(0),
            prob=1.0, partners=partners, centers=centers)

        # output 0 tiles: TL=src0, TR=src1, BL=src2, BR=src3
        rects = {0: (0, 0, cx, cy), 1: (cx, 0, w, cy),
                 2: (0, cy, cx, h), 3: (cx, cy, w, h)}
        expected = {}
        for q, (x0, y0, x1, y1) in rects.items():
            sx, sy = (x1 - x0) / w, (y1 - y0) / h
            bx = src_boxes[q, 0]
            expected[q] = [bx[0] * sx + x0, bx[1] * sy + y0,
                           bx[2] * sx + x0, bx[3] * sy + y0]
        got_boxes = np.asarray(out_boxes[0])
        got_classes = np.asarray(out_classes[0])
        got_valid = np.asarray(out_valid[0])
        # capacity N=1 → only the largest-area mapped box is kept
        areas = {q: (e[2] - e[0]) * (e[3] - e[1])
                 for q, e in expected.items()}
        best_q = max(areas, key=areas.get)
        assert got_valid[0]
        assert got_classes[0] == best_q
        np.testing.assert_allclose(got_boxes[0], expected[best_q],
                                   rtol=1e-5, atol=1e-3)

    def test_quadrant_pixel_content(self):
        colors = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0)]
        images = jnp.asarray(np.stack([solid(c) for c in colors]))
        boxes = jnp.zeros((4, 2, 4))
        classes = jnp.zeros((4, 2), jnp.int32)
        valid = jnp.zeros((4, 2), bool)
        partners = jnp.asarray(np.array(
            [[1, 2, 3, 0], [2, 3, 0, 1], [3, 0, 1, 2]], np.int32))
        centers = jnp.asarray(np.tile([[32.0, 32.0]], (4, 1))
                              .astype(np.float32))
        out_img, *_ = mosaic_batch(
            images, boxes, classes, valid, jax.random.key(0),
            prob=1.0, partners=partners, centers=centers)
        m = np.asarray(out_img[0])
        np.testing.assert_allclose(m[8, 8], colors[0])     # TL ← src 0
        np.testing.assert_allclose(m[8, 56], colors[1])    # TR ← src 1
        np.testing.assert_allclose(m[56, 8], colors[2])    # BL ← src 2
        np.testing.assert_allclose(m[56, 56], colors[3])   # BR ← src 3

    def test_prob_zero_is_identity(self):
        rng = np.random.default_rng(0)
        images = jnp.asarray(rng.uniform(0, 255, (4, 32, 32, 3))
                             .astype(np.float32))
        boxes = jnp.asarray(rng.uniform(0, 32, (4, 3, 4)).astype(np.float32))
        classes = jnp.zeros((4, 3), jnp.int32)
        valid = jnp.ones((4, 3), bool)
        o_img, o_boxes, _, o_valid = mosaic_batch(
            images, boxes, classes, valid, jax.random.key(1), prob=0.0)
        np.testing.assert_array_equal(np.asarray(o_img), np.asarray(images))
        np.testing.assert_array_equal(np.asarray(o_boxes), np.asarray(boxes))
        np.testing.assert_array_equal(np.asarray(o_valid), np.asarray(valid))

    def test_tiny_boxes_invalidated(self):
        """A box that collapses below 1px inside its tile is dropped."""
        h = w = 64
        images = jnp.zeros((4, h, w, 3))
        # 3px-wide source box: with a tile 16/64 wide it maps to <1px
        boxes = jnp.asarray(np.tile(
            np.array([[[30, 30, 33, 60]]], np.float32), (4, 1, 1)))
        classes = jnp.zeros((4, 1), jnp.int32)
        valid = jnp.ones((4, 1), bool)
        partners = jnp.asarray(np.array(
            [[1, 2, 3, 0], [2, 3, 0, 1], [3, 0, 1, 2]], np.int32))
        centers = jnp.asarray(np.tile([[16.0, 32.0]], (4, 1))
                              .astype(np.float32))  # TL tile is 16 wide
        _, ob, _, ov = mosaic_batch(
            images, boxes, classes, valid, jax.random.key(0),
            prob=1.0, partners=partners, centers=centers)
        # capacity 1: survivor must come from a wide-enough tile (TR/BR,
        # 48px wide → 3*48/64 = 2.25px > 1) — never the 0.75px TL mapping
        got = np.asarray(ob[0])
        assert np.asarray(ov[0])[0]
        assert got[0, 2] - got[0, 0] > 1.0

    def test_jit_and_batch_shapes(self):
        rng = np.random.default_rng(2)
        images = jnp.asarray(rng.uniform(0, 255, (6, 48, 48, 3))
                             .astype(np.float32))
        boxes = jnp.asarray(rng.uniform(0, 48, (6, 5, 4)).astype(np.float32))
        classes = jnp.zeros((6, 5), jnp.int32)
        valid = jnp.ones((6, 5), bool)
        f = jax.jit(lambda *a: mosaic_batch(*a, prob=0.7))
        oi, ob, oc, ov = f(images, boxes, classes, valid, jax.random.key(3))
        assert oi.shape == images.shape and oi.dtype == images.dtype
        assert ob.shape == boxes.shape and ov.shape == valid.shape


class TestMosaicPipeline:
    def test_pipeline_wires_mosaic(self, tmp_path):
        """YoloDataPipeline(mosaic=1.0) yields batches end to end."""
        from PIL import Image

        rng = np.random.default_rng(0)
        for i in range(4):
            Image.fromarray(rng.integers(0, 255, (80, 120, 3), dtype=np.uint8),
                            "RGB").save(tmp_path / f"im{i}.jpg")
        (tmp_path / "classes.txt").write_text("cat\ndog\n")
        lines = [f"im{i}.jpg|cat,10,10,60,50|dog,70,30,110,70|"
                 for i in range(4)]
        (tmp_path / "labels.txt").write_text("\n".join(lines) + "\n")
        anchors = np.array([[[116, 90], [156, 198], [373, 326]],
                            [[30, 61], [62, 45], [59, 119]],
                            [[10, 13], [16, 30], [33, 23]]], np.float32)

        from tmv_tpu.data.yolo_pipeline import YoloDataPipeline

        pipe = YoloDataPipeline(
            str(tmp_path), str(tmp_path / "labels.txt"),
            str(tmp_path / "classes.txt"), 4, anchors,
            image_wh=(64, 64), mosaic=1.0, max_boxes=8)
        batch = next(iter(pipe))
        assert batch["image"].shape == (4, 64, 64, 3)
        assert np.isfinite(np.asarray(batch["image"])).all()
        # targets exist per scale and objectness is finite
        for t in batch["targets"]:
            assert np.isfinite(np.asarray(t)).all()
