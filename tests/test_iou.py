import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tmv_tpu.ops.iou import iou_xyxy, iou_yxyx


def np_iou_corners(a, b):
    """Plain IoU oracle for corner boxes (any convention, axis-symmetric)."""
    inter_min = np.maximum(a[..., 0:2], b[..., 0:2])
    inter_max = np.minimum(a[..., 2:4], b[..., 2:4])
    wh = np.maximum(inter_max - inter_min, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    return inter / (area_a + area_b - inter)


def random_boxes(rng, n, convention="xyxy"):
    mins = rng.uniform(0, 80, size=(n, 2))
    sizes = rng.uniform(1, 40, size=(n, 2))
    return np.concatenate([mins, mins + sizes], axis=-1).astype(np.float32)


class TestIouXYXY:
    def test_identity(self):
        b = jnp.array([[0.0, 0.0, 10.0, 10.0]])
        assert float(iou_xyxy(b, b)[0]) == pytest.approx(1.0)

    def test_disjoint(self):
        b1 = jnp.array([[0.0, 0.0, 10.0, 10.0]])
        b2 = jnp.array([[20.0, 20.0, 30.0, 30.0]])
        assert float(iou_xyxy(b1, b2)[0]) == pytest.approx(0.0)

    def test_matches_numpy_oracle(self, rng):
        a = random_boxes(rng, 7)[:, None, :]
        b = random_boxes(rng, 5)[None, :, :]
        got = np.asarray(iou_xyxy(jnp.asarray(a), jnp.asarray(b)))
        want = np_iou_corners(a, b)
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_diou_quirk_exponent(self):
        # Reference DIoU subtracts (u/c)**0.6, not u/c (tf_iou_utils.py:50).
        b1 = np.array([[10.0, 10.0, 30.0, 30.0]], np.float32)
        b2 = np.array([[20.0, 20.0, 40.0, 40.0]], np.float32)
        iou = np_iou_corners(b1, b2)[0]
        u = 2 * 10.0**2  # center distance sq
        c = 2 * 30.0**2  # enclosing diag sq
        want = iou - (u / c) ** 0.6
        got = float(iou_xyxy(jnp.asarray(b1), jnp.asarray(b2), "diou")[0])
        assert got == pytest.approx(want, rel=1e-5)

    def test_diou_same_box(self):
        # identical boxes: d = 0, so diou == iou == 1 (0**0.6 == 0)
        b = jnp.array([[0.0, 0.0, 10.0, 10.0]])
        assert float(iou_xyxy(b, b, "diou")[0]) == pytest.approx(1.0)

    def test_ciou_leq_iou(self, rng):
        a = random_boxes(rng, 6)[:, None, :]
        b = random_boxes(rng, 6)[None, :, :]
        ciou = np.asarray(iou_xyxy(jnp.asarray(a), jnp.asarray(b), "ciou"))
        iou = np.asarray(iou_xyxy(jnp.asarray(a), jnp.asarray(b), "iou"))
        assert (ciou <= iou + 1e-6).all()


class TestIouYXYX:
    def test_reference_doc_example(self):
        # `efficientnet/utils/iou.py:103-112` example boxes.
        b1 = jnp.array([[10.0, 10.0, 30.0, 30.0]])
        b2 = jnp.array([[20.0, 20.0, 40.0, 40.0]])
        iou = float(iou_yxyx(b1, b2, "iou")[0])
        assert iou == pytest.approx(100.0 / 700.0, rel=1e-6)
        # standard DIoU: iou - d^2 / c^2
        diou = float(iou_yxyx(b1, b2, "diou")[0])
        assert diou == pytest.approx(100.0 / 700.0 - 200.0 / 1800.0, rel=1e-6)

    def test_zero_box_divide_no_nan(self):
        z = jnp.zeros((1, 4))
        assert float(iou_yxyx(z, z)[0]) == 0.0
        assert np.isfinite(float(iou_yxyx(z, z, "ciou")[0]))

    def test_giou_range(self, rng):
        a = random_boxes(rng, 8)[:, None, :]
        b = random_boxes(rng, 8)[None, :, :]
        g = np.asarray(iou_yxyx(jnp.asarray(a), jnp.asarray(b), "giou"))
        assert (g >= -1 - 1e-6).all() and (g <= 1 + 1e-6).all()

    def test_ciou_grad_finite(self):
        # Custom VJP (iou.py _ciou_v) must stay finite for degenerate preds.
        def loss(pred):
            tgt = jnp.array([[10.0, 10.0, 30.0, 30.0]])
            return jnp.sum(1.0 - iou_yxyx(tgt, pred, "ciou"))

        g = jax.grad(loss)(jnp.array([[12.0, 12.0, 28.0, 33.0]]))
        assert np.isfinite(np.asarray(g)).all()
        g0 = jax.grad(loss)(jnp.array([[10.0, 10.0, 10.0, 10.0]]))
        assert np.isfinite(np.asarray(g0)).all()
