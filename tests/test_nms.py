"""NMS equivalence-oracle tests.

A sequential numpy re-implementation of the reference's greedy while-loops
(`utils/tf_iou_utils.py:67-157`, `efficientnet/utils/nms.py:4-61`) serves as
the oracle; the static-shape JAX version must select the same indices in the
same order.
"""

import numpy as np
import jax.numpy as jnp

from tmv_tpu.ops.nms import nms, nms_by_classes


def np_iou_row(box, boxes):
    inter_min = np.maximum(box[0:2], boxes[:, 0:2])
    inter_max = np.minimum(box[2:4], boxes[:, 2:4])
    wh = np.maximum(inter_max - inter_min, 0.0)
    inter = wh[:, 0] * wh[:, 1]
    area_a = (box[2] - box[0]) * (box[3] - box[1])
    area_b = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return inter / (area_a + area_b - inter)


def sequential_nms(boxes, scores, classes=None, max_out=500, iou_thr=0.5,
                   score_thr=float("-inf")):
    """Oracle mirroring the reference's sequential greedy NMS."""
    order = list(np.argsort(-scores, kind="stable"))
    out = []
    while order and len(out) < max_out:
        top = order.pop(0)
        if scores[top] < score_thr:
            break
        out.append(top)
        iou = np_iou_row(boxes[top], boxes[np.array(order, dtype=int)]) if order else []
        keep = []
        for j, o in enumerate(order):
            suppress = iou[j] >= iou_thr
            if classes is not None:
                suppress = suppress and classes[o] == classes[top]
            if not suppress:
                keep.append(o)
        order = keep
    return out


def random_cluster_boxes(rng, n):
    # clustered boxes so NMS actually suppresses
    centers = rng.uniform(10, 90, size=(n // 4 + 1, 2))
    idx = rng.integers(0, len(centers), size=n)
    c = centers[idx] + rng.normal(0, 3, size=(n, 2))
    wh = rng.uniform(5, 25, size=(n, 2))
    return np.concatenate([c - wh / 2, c + wh / 2], axis=-1).astype(np.float32)


class TestNms:
    def test_matches_sequential_oracle(self, rng):
        for trial in range(5):
            n = 64
            boxes = random_cluster_boxes(rng, n)
            scores = rng.uniform(0, 1, size=n).astype(np.float32)
            want = sequential_nms(boxes, scores, max_out=10, iou_thr=0.5)
            idx, valid = nms(jnp.asarray(boxes), jnp.asarray(scores),
                             max_output_size=10, iou_threshold=0.5)
            got = np.asarray(idx)[np.asarray(valid)]
            np.testing.assert_array_equal(got, want)

    def test_score_threshold(self, rng):
        n = 32
        boxes = random_cluster_boxes(rng, n)
        scores = rng.uniform(0, 1, size=n).astype(np.float32)
        want = sequential_nms(boxes, scores, max_out=32, score_thr=0.5)
        idx, valid = nms(jnp.asarray(boxes), jnp.asarray(scores),
                         max_output_size=32, score_threshold=0.5)
        got = np.asarray(idx)[np.asarray(valid)]
        np.testing.assert_array_equal(got, want)

    def test_padding_ignored(self, rng):
        n = 16
        boxes = random_cluster_boxes(rng, n)
        scores = rng.uniform(0, 1, size=n).astype(np.float32)
        want = sequential_nms(boxes, scores, max_out=16)
        # pad with garbage that would otherwise win
        pad_boxes = np.concatenate([boxes, boxes[:4]], axis=0)
        pad_scores = np.concatenate([scores, np.full(4, 10.0, np.float32)])
        valid_in = np.concatenate([np.ones(n, bool), np.zeros(4, bool)])
        idx, valid = nms(jnp.asarray(pad_boxes), jnp.asarray(pad_scores),
                         jnp.asarray(valid_in), max_output_size=16)
        got = np.asarray(idx)[np.asarray(valid)]
        np.testing.assert_array_equal(got, want)

    def test_max_output_cap(self, rng):
        n = 40
        boxes = random_cluster_boxes(rng, n)
        scores = rng.uniform(0, 1, size=n).astype(np.float32)
        idx, valid = nms(jnp.asarray(boxes), jnp.asarray(scores),
                         max_output_size=3, iou_threshold=0.99)
        assert int(np.asarray(valid).sum()) == 3
        # top-3 by score survive at iou_thr≈1 (nothing suppressed)
        np.testing.assert_array_equal(
            np.asarray(idx), np.argsort(-scores, kind="stable")[:3])


class TestNmsByClasses:
    def test_matches_sequential_oracle(self, rng):
        for trial in range(5):
            n = 48
            boxes = random_cluster_boxes(rng, n)
            scores = rng.uniform(0, 1, size=n).astype(np.float32)
            classes = rng.integers(0, 3, size=n).astype(np.int32)
            want = sequential_nms(boxes, scores, classes, max_out=20)
            idx, valid = nms_by_classes(
                jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
                max_output_size=20)
            got = np.asarray(idx)[np.asarray(valid)]
            np.testing.assert_array_equal(got, want)

    def test_different_classes_not_suppressed(self):
        boxes = jnp.asarray(np.array([[0, 0, 10, 10], [0, 0, 10, 10]], np.float32))
        scores = jnp.asarray(np.array([0.9, 0.8], np.float32))
        classes = jnp.asarray(np.array([0, 1], np.int32))
        idx, valid = nms_by_classes(boxes, scores, classes, max_output_size=5)
        assert int(np.asarray(valid).sum()) == 2
