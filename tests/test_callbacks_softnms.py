import numpy as np
import jax.numpy as jnp
import pytest

from tmv_tpu.core.callbacks import EarlyStopping, ReduceLROnPlateau
from tmv_tpu.ops.nms import soft_nms


class TestEarlyStopping:
    def test_stops_after_patience(self):
        es = EarlyStopping(patience=3)
        vals = [1.0, 0.9, 0.9, 0.9, 0.9]
        stops = [es.update(v) for v in vals]
        assert stops == [False, False, False, False, True]

    def test_improvement_resets(self):
        es = EarlyStopping(patience=2)
        for v in [1.0, 0.9, 0.95, 0.8, 0.85, 0.86]:
            stopped = es.update(v)
        assert stopped  # two flat epochs after 0.8


class TestReduceLROnPlateau:
    def test_reduces_after_patience(self):
        r = ReduceLROnPlateau(factor=0.5, patience=2, base_lr=1.0)
        lrs = [r.update(v) for v in [1.0, 1.0, 1.0, 1.0, 1.0]]
        # flat metric → a reduction every `patience` epochs (Keras behavior)
        assert lrs[2] == pytest.approx(0.5)
        assert lrs[-1] == pytest.approx(0.25)

    def test_min_lr_floor(self):
        r = ReduceLROnPlateau(factor=0.1, patience=1, base_lr=1e-5,
                              min_lr=1e-6)
        for _ in range(10):
            lr = r.update(1.0)
        assert lr == pytest.approx(1e-6)


class TestSoftNms:
    def test_overlapping_decayed_not_removed(self):
        boxes = jnp.asarray(np.array(
            [[0, 0, 10, 10], [0, 0, 10, 10], [50, 50, 60, 60]], np.float32))
        scores = jnp.asarray(np.array([0.9, 0.8, 0.7], np.float32))
        idxs, out_scores, valids = soft_nms(boxes, scores, max_output_size=3,
                                            sigma=0.5)
        v = np.asarray(valids)
        assert v.all()
        order = np.asarray(idxs)
        assert order[0] == 0
        # duplicate box decayed: exp(-1/0.5)*0.8 ≈ 0.108 → picked last
        assert order[1] == 2 and order[2] == 1
        assert np.asarray(out_scores)[2] == pytest.approx(
            0.8 * np.exp(-1 / 0.5), rel=1e-4)

    def test_threshold_drops(self):
        boxes = jnp.asarray(np.array(
            [[0, 0, 10, 10], [1, 1, 11, 11]], np.float32))
        scores = jnp.asarray(np.array([0.9, 0.01], np.float32))
        idxs, out_scores, valids = soft_nms(boxes, scores, max_output_size=2,
                                            score_threshold=0.05)
        assert np.asarray(valids).tolist() == [True, False]
