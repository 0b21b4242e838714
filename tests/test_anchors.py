"""Anchor round-trip tests, modeled on the reference's
`ai_models/tests/test_anchors.py` rig: generate targets from toy GT boxes,
decode outputs back, NMS, and recover the GT."""

import numpy as np
import jax.numpy as jnp
import pytest

from tmv_tpu.ops.anchors import Anchors, get_feat_sizes


@pytest.fixture(scope="module")
def anchors():
    return Anchors(min_level=3, max_level=7, image_size=(512, 512),
                   num_scales=3,
                   aspect_ratios=[(1.0, 1.0), (1.4, 0.7), (0.7, 1.4)],
                   anchor_scale=4.0)


class TestFeatSizes:
    def test_halving_chain(self):
        sizes = get_feat_sizes((512, 512), 7)
        assert sizes[0] == (512, 512)
        assert sizes[3] == (64, 64)
        assert sizes[7] == (4, 4)

    def test_odd_sizes(self):
        sizes = get_feat_sizes((513, 513), 3)
        assert sizes[1] == (257, 257)
        assert sizes[2] == (129, 129)


class TestAnchorGeneration:
    def test_level_shapes(self, anchors):
        assert len(anchors.boxes) == 5
        for lvl, b in zip(range(3, 8), anchors.boxes):
            fs = anchors.feat_sizes[lvl]
            assert b.shape == (fs[0], fs[1], 9, 4)

    def test_centers_on_stride_grid(self, anchors):
        b0 = anchors.boxes[0]  # level 3, stride 8
        cy = (b0[0, 0, 0, 0] + b0[0, 0, 0, 2]) / 2
        cx = (b0[0, 0, 0, 1] + b0[0, 0, 0, 3]) / 2
        assert cy == pytest.approx(4.0) and cx == pytest.approx(4.0)
        cy2 = (b0[1, 0, 0, 0] + b0[1, 0, 0, 2]) / 2
        assert cy2 == pytest.approx(12.0)

    def test_base_anchor_size(self, anchors):
        # level 3, octave 0, aspect (1,1): size = 4 * 8 = 32
        b0 = anchors.boxes[0]
        h = b0[0, 0, 0, 2] - b0[0, 0, 0, 0]
        assert h == pytest.approx(32.0)


class TestTargetsRoundTrip:
    def test_roundtrip(self, anchors):
        gt = jnp.asarray(np.array(
            [[100.0, 100.0, 200.0, 220.0],
             [300.0, 320.0, 400.0, 380.0],
             [0.0, 0.0, 0.0, 0.0]], np.float32))
        cls = jnp.asarray(np.array([5, 12, 0], np.int32))
        valid = jnp.asarray(np.array([True, True, False]))
        boxes_t, classes_t, masks = anchors.generate_targets(
            gt, cls, classes_num=81, valid=valid)
        total_pos = sum(int(np.asarray(m).sum()) for m in masks)
        assert total_pos > 0
        # decode: batchify and invert
        decoded = anchors.convert_outputs_boxes(
            tuple(b[None] for b in boxes_t))
        found = []
        for dec, m in zip(decoded, masks):
            d = np.asarray(dec[0])[np.asarray(m[..., 0])]
            found.append(d)
        found = np.concatenate(found, axis=0)
        # every positive anchor decodes exactly to one of the GT boxes
        for row in found:
            d0 = np.abs(row - np.asarray(gt[0])).max()
            d1 = np.abs(row - np.asarray(gt[1])).max()
            assert min(d0, d1) < 1e-2

    def test_padded_gt_never_matches(self, anchors):
        gt = jnp.zeros((3, 4))
        cls = jnp.zeros((3,), jnp.int32)
        valid = jnp.zeros((3,), bool)
        _, classes_t, masks = anchors.generate_targets(gt, cls, 81, valid)
        assert all(int(np.asarray(m).sum()) == 0 for m in masks)

    def test_one_hot_background(self, anchors):
        gt = jnp.asarray(np.array([[100.0, 100.0, 200.0, 220.0]], np.float32))
        cls = jnp.asarray(np.array([7], np.int32))
        _, classes_t, masks = anchors.generate_targets(gt, cls, 81)
        for ct, m in zip(classes_t, masks):
            ct, m = np.asarray(ct), np.asarray(m[..., 0])
            # negatives are one-hot class 0 (background)
            neg = ct[~m]
            if neg.size:
                assert (neg.argmax(-1) == 0).all()
            pos = ct[m]
            if pos.size:
                assert (pos.argmax(-1) == 7).all()


class TestConvertOutputsOne:
    def test_decode_and_nms(self, anchors):
        gt = jnp.asarray(np.array(
            [[100.0, 100.0, 200.0, 220.0], [300.0, 320.0, 400.0, 380.0]],
            np.float32))
        cls = jnp.asarray(np.array([5, 12], np.int32))
        boxes_t, classes_t, masks = anchors.generate_targets(gt, cls, 81)
        # decode regressions first (reference: convert_outputs_boxes before
        # convert_outputs_one, efficientdet_net_train.py:153-157)
        outputs_boxes = anchors.convert_outputs_boxes(
            tuple(b[None] for b in boxes_t))
        outputs_classes = tuple((c * 10.0 - 5.0)[None] for c in classes_t)
        b, ids, scores, valid = anchors.convert_outputs_one(
            0, outputs_boxes, outputs_classes)
        b = np.asarray(b)[np.asarray(valid)]
        ids = np.asarray(ids)[np.asarray(valid)]
        assert set(ids.tolist()) == {5, 12}
        for row, cid in zip(b, ids):
            target = np.asarray(gt[0] if cid == 5 else gt[1])
            assert np.abs(row - target).max() < 1e-2
