import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tmv_tpu.ops import losses


def np_sigmoid(x):
    return 1 / (1 + np.exp(-x))


class TestSigmoidCE:
    def test_matches_formula(self, rng):
        logits = rng.normal(0, 3, size=(4, 5)).astype(np.float32)
        labels = rng.uniform(0, 1, size=(4, 5)).astype(np.float32)
        got = np.asarray(losses.sigmoid_cross_entropy(jnp.asarray(labels),
                                                      jnp.asarray(logits)))
        p = np_sigmoid(logits)
        want = -(labels * np.log(p) + (1 - labels) * np.log(1 - p))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


class TestFocalLoss:
    def test_reduces_to_weighted_ce_at_gamma0(self, rng):
        y = (rng.uniform(size=(8,)) > 0.5).astype(np.float32)
        logits = rng.normal(size=(8,)).astype(np.float32)
        got = np.asarray(losses.focal_loss(jnp.asarray(y), jnp.asarray(logits),
                                           1.0, alpha=0.25, gamma=0.0))
        ce = np.asarray(losses.sigmoid_cross_entropy(jnp.asarray(y),
                                                     jnp.asarray(logits)))
        alpha_f = y * 0.25 + (1 - y) * 0.75
        np.testing.assert_allclose(got, alpha_f * ce, rtol=1e-5)

    def test_easy_examples_downweighted(self):
        y = jnp.array([1.0])
        easy = float(losses.focal_loss(y, jnp.array([6.0]), 1.0).sum())
        hard = float(losses.focal_loss(y, jnp.array([-6.0]), 1.0).sum())
        assert easy < hard * 1e-3

    def test_label_smoothing_changes_ce_not_modulation(self):
        y = jnp.array([1.0])
        logits = jnp.array([2.0])
        a = float(losses.focal_loss(y, logits, 1.0, label_smoothing=0.0).sum())
        b = float(losses.focal_loss(y, logits, 1.0, label_smoothing=0.1).sum())
        assert b > a  # smoothing adds CE mass on the positive side


class TestBoxLoss:
    def test_zero_targets_masked_out(self):
        targets = jnp.zeros((2, 4, 4))
        outputs = jnp.full((2, 4, 4), 3.0)
        out = losses.box_loss(targets, outputs, jnp.asarray(5.0))
        assert float(out) == 0.0

    def test_huber_regions(self):
        t = jnp.array([0.0])
        assert float(losses.huber(t, jnp.array([0.05]), 0.1)[0]) == pytest.approx(
            0.5 * 0.05**2)
        assert float(losses.huber(t, jnp.array([1.0]), 0.1)[0]) == pytest.approx(
            0.1 * 1.0 - 0.5 * 0.01)

    def test_normalization(self):
        targets = jnp.ones((1, 2, 4))
        outputs = jnp.ones((1, 2, 4)) + 1.0  # err 1 → huber δ=.1: .1-.005=.095
        out = losses.box_loss(targets, outputs, jnp.asarray(2.0))
        assert float(out) == pytest.approx(8 * 0.095 / 8.0)


class TestFocusLoss:
    def test_perfect_prediction_small(self, rng):
        y = np.zeros((2, 8, 8, 3), np.float32)
        y[:, 4, 4, :] = 1.0
        logits = np.where(y > 0, 20.0, -20.0).astype(np.float32)
        out = float(losses.focus_loss(jnp.asarray(y), jnp.asarray(logits)))
        assert out < 1e-4

    def test_balanced_normalization(self):
        # all-wrong bg predictions normalized by bg count & frequency
        y = np.zeros((1, 4, 4, 1), np.float32)
        y[0, 0, 0, 0] = 1.0
        logits = np.zeros_like(y)  # sigmoid=0.5 everywhere
        out = float(losses.focus_loss(jnp.asarray(y), jnp.asarray(logits)))
        assert np.isfinite(out) and out > 0


class TestTriplet:
    def test_margin_satisfied_zero(self):
        a = jnp.zeros((2, 4))
        p = jnp.zeros((2, 4))
        n = jnp.ones((2, 4)) * 10
        assert float(losses.triplet_loss(a, p, n, alpha=0.2)) == 0.0

    def test_violation_positive_and_masked(self):
        a = jnp.zeros((2, 4))
        p = jnp.ones((2, 4))  # pos dist 4
        n = jnp.zeros((2, 4))  # neg dist 0
        full = float(losses.triplet_loss(a, p, n, alpha=0.2))
        assert full == pytest.approx(4.2)
        masked = float(losses.triplet_loss(a, p, n, 0.2,
                                           valid=jnp.array([True, False])))
        assert masked == pytest.approx(4.2)


class TestInfoNCE:
    def test_positive_alignment_lowers_loss(self, rng):
        n, c, k = 4, 16, 32
        feats = rng.normal(size=(n, c)).astype(np.float32)
        queue = rng.normal(size=(k, c)).astype(np.float32)
        queue /= np.linalg.norm(queue, axis=1, keepdims=True)
        aligned = losses.moco_info_nce_loss(
            [jnp.asarray(feats)], [jnp.asarray(feats)], jnp.asarray(queue))
        rand_k = rng.normal(size=(n, c)).astype(np.float32)
        misaligned = losses.moco_info_nce_loss(
            [jnp.asarray(feats)], [jnp.asarray(rand_k)], jnp.asarray(queue))
        assert float(aligned) < float(misaligned)


class TestL2Reg:
    def test_only_kernels_counted(self):
        params = {"conv": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones((2,))},
                  "bn": {"scale": jnp.ones((3,))}}
        out = float(losses.l2_regularization(params, 0.5))
        assert out == pytest.approx(0.5 * 4.0)


class TestClassFocal:
    def test_empty_level_no_nan(self):
        targets = [jnp.zeros((2, 4, 4, 9, 5))]
        outputs = [jnp.zeros((2, 4, 4, 9, 5))]
        masks = [jnp.zeros((2, 4, 4, 9, 1), bool)]
        out = losses.class_focal_loss(targets, outputs, masks, 0.25, 1.5)
        assert np.isfinite(float(out))
