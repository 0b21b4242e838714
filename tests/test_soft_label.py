import numpy as np
import jax.numpy as jnp
import pytest

from tmv_tpu.ops.soft_label import SoftLabel, gaussian_kernel_2d


class TestGaussianKernel:
    def test_shape_and_peak(self):
        k = gaussian_kernel_2d((11, 11, 1, 1))
        assert k.shape == (11, 11, 1, 1)
        assert np.unravel_index(k.argmax(), k.shape)[:2] == (5, 5)

    def test_symmetry(self):
        k = gaussian_kernel_2d((11, 11, 1, 1))[:, :, 0, 0]
        np.testing.assert_allclose(k, k.T, rtol=1e-6)


class TestSoftLabel:
    def test_heatmap_peaks_at_points(self):
        sl = SoftLabel(image_size=(100, 100), points_num=3, kernel_size=(11, 11))
        pts = jnp.asarray(np.array([[-10, 10], [15, 15], [50, 50]], np.int32))
        x = np.asarray(sl.get_target(pts))
        assert x.shape == (100, 100, 3)
        # out-of-range point → empty channel (no NaN)
        assert np.isfinite(x).all()
        assert x[..., 0].max() == 0.0
        # in-range points peak (value 1 after max-normalize) at the keypoint
        assert x[15, 15, 1] == pytest.approx(1.0)
        assert x[50, 50, 2] == pytest.approx(1.0)
        # gaussian spread: neighbor nonzero but below peak
        assert 0 < x[16, 15, 1] < 1.0

    def test_channels_independent(self):
        sl = SoftLabel(image_size=(40, 40), points_num=2, kernel_size=(7, 7))
        pts = jnp.asarray(np.array([[10, 10], [30, 30]], np.int32))
        x = np.asarray(sl.get_target(pts))
        assert x[10, 10, 0] == pytest.approx(1.0)
        assert x[10, 10, 1] == pytest.approx(0.0, abs=1e-6)


class TestRegularizers:
    def test_drop_connect_eval_identity(self, rng):
        import jax
        from tmv_tpu.ops.regularizers import drop_connect
        x = jnp.asarray(rng.normal(size=(4, 2, 2, 3)).astype(np.float32))
        out = drop_connect(x, jax.random.key(0), False, 0.8)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))

    def test_drop_connect_train_scaling(self, rng):
        import jax
        from tmv_tpu.ops.regularizers import drop_connect
        x = jnp.ones((512, 1, 1, 1))
        out = np.asarray(drop_connect(x, jax.random.key(1), True, 0.8))
        # samples are either 0 or 1/0.8
        vals = np.unique(out.round(6))
        assert set(vals.tolist()) <= {0.0, round(1 / 0.8, 6)}
        assert out.mean() == pytest.approx(1.0, abs=0.1)

    def test_drop_block_masks_blocks(self, rng):
        import jax
        from tmv_tpu.ops.regularizers import drop_block
        x = jnp.ones((2, 32, 32, 8))
        out = np.asarray(drop_block(x, jax.random.key(2), True, 0.3, 5))
        assert out.min() == 0.0 and out.max() == 1.0
        frac = (out == 0).mean()
        assert 0.05 < frac < 0.6

    def test_disout_eval_identity(self, rng):
        import jax
        from tmv_tpu.ops.regularizers import disout
        x = jnp.asarray(rng.normal(size=(2, 16, 16, 4)).astype(np.float32))
        out = disout(x, jax.random.key(3), False, 0.2)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
