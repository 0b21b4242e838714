"""Pallas NMS kernel vs the XLA reference implementation (interpret mode
on CPU; the compiled path runs on TPU in bench)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tmv_tpu.kernels.nms_pallas import nms_pallas
from tmv_tpu.ops.nms import nms, nms_by_classes


def cluster_boxes(rng, n):
    centers = rng.uniform(10, 90, size=(n // 4 + 1, 2))
    idx = rng.integers(0, len(centers), size=n)
    c = centers[idx] + rng.normal(0, 3, size=(n, 2))
    wh = rng.uniform(5, 25, size=(n, 2))
    return np.concatenate([c - wh / 2, c + wh / 2], axis=-1).astype(np.float32)


class TestPallasNms:
    def test_matches_xla_plain(self, rng):
        n = 96
        boxes = cluster_boxes(rng, n)
        scores = rng.uniform(0, 1, size=n).astype(np.float32)
        want_idx, want_valid = nms(jnp.asarray(boxes), jnp.asarray(scores),
                                   max_output_size=20)
        got_idx, got_valid = nms_pallas(
            jnp.asarray(boxes), jnp.asarray(scores), max_output_size=20,
            interpret=True)
        np.testing.assert_array_equal(np.asarray(want_valid),
                                      np.asarray(got_valid))
        np.testing.assert_array_equal(
            np.asarray(want_idx)[np.asarray(want_valid)],
            np.asarray(got_idx)[np.asarray(got_valid)])

    def test_matches_xla_class_aware(self, rng):
        n = 96
        boxes = cluster_boxes(rng, n)
        scores = rng.uniform(0, 1, size=n).astype(np.float32)
        classes = rng.integers(0, 3, size=n).astype(np.int32)
        want_idx, want_valid = nms_by_classes(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
            max_output_size=30)
        got_idx, got_valid = nms_pallas(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
            max_output_size=30, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(want_idx)[np.asarray(want_valid)],
            np.asarray(got_idx)[np.asarray(got_valid)])

    def test_score_threshold_and_padding(self, rng):
        n = 64
        boxes = cluster_boxes(rng, n)
        scores = rng.uniform(0, 1, size=n).astype(np.float32)
        valid = rng.uniform(size=n) > 0.3
        want_idx, want_valid = nms(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
            max_output_size=16, score_threshold=0.4)
        got_idx, got_valid = nms_pallas(
            jnp.asarray(boxes), jnp.asarray(scores), valid=jnp.asarray(valid),
            max_output_size=16, score_threshold=0.4, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(want_idx)[np.asarray(want_valid)],
            np.asarray(got_idx)[np.asarray(got_valid)])

    def test_diou_variant(self, rng):
        n = 64
        boxes = cluster_boxes(rng, n)
        scores = rng.uniform(0, 1, size=n).astype(np.float32)
        want_idx, want_valid = nms(
            jnp.asarray(boxes), jnp.asarray(scores), max_output_size=16,
            iou_type="diou")
        got_idx, got_valid = nms_pallas(
            jnp.asarray(boxes), jnp.asarray(scores), max_output_size=16,
            iou_type="diou", interpret=True)
        np.testing.assert_array_equal(
            np.asarray(want_idx)[np.asarray(want_valid)],
            np.asarray(got_idx)[np.asarray(got_valid)])
