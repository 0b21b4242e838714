import numpy as np
import pytest

from tmv_tpu.utils import image_helper


class TestProportionalResize:
    def test_geometry_and_points(self):
        img = np.full((100, 200, 3), 128, np.uint8)
        out, pts, padding = image_helper.proportional_resize(
            img, (416, 416), points=np.array([[0.0, 0.0], [200.0, 100.0]]))
        assert out.shape == (416, 416, 3)
        pad_t, pad_b, pad_l, pad_r = padding
        assert pad_l == 0 and pad_r == 0
        # content height = 100/(200/416) = 208 → 104 top/bottom
        assert pad_t == 104 and pad_b == 104
        np.testing.assert_allclose(pts[0], [0, 104], atol=1e-6)
        np.testing.assert_allclose(pts[1], [416, 312], atol=1e-6)


class TestPerspective:
    def test_identity(self):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        pts = np.array([[10.0, 10.0], [50.0, 30.0]])
        out, new_pts = image_helper.perspective(img, points=pts,
                                                degrees=(0, 0, 0))
        np.testing.assert_array_equal(out, img)
        np.testing.assert_allclose(new_pts, pts, atol=1e-6)

    def test_z_rotation_tracks_points(self):
        img = np.zeros((100, 100, 3), np.uint8)
        img[20:30, 20:30] = 255
        pts = np.array([[25.0, 25.0]])
        out, new_pts = image_helper.perspective(img, points=pts,
                                                degrees=(0, 0, 90))
        # 90° about center: (25,25) → (center + rotated offset)
        # offset (-25,-25) rotated by Rz(90): (x,y)→(x cosθ − y sinθ, …)
        expect = np.array([[50 + 25.0, 50 - 25.0]])
        np.testing.assert_allclose(new_pts, expect, atol=1e-4)
        # the bright patch moved to where the tracked point says
        py, px = int(new_pts[0, 1]), int(new_pts[0, 0])
        assert out[py, px].max() > 200

    def test_tilt_keeps_points_inside(self):
        img = np.full((80, 80, 3), 100, np.uint8)
        pts = np.array([[40.0, 40.0]])
        out, new_pts = image_helper.perspective(img, points=pts,
                                                degrees=(20, -15, 5))
        # the center stays near the center under small tilts
        assert np.abs(new_pts - 40).max() < 10


class TestConversions:
    def test_base64_roundtrip(self):
        data = b"hello tpu"
        assert image_helper.base64_to_bytes(
            image_helper.bytes_to_base64(data)) == data

    def test_jpeg_roundtrip(self):
        img = np.zeros((32, 32, 3), np.uint8)
        img[8:24, 8:24] = [255, 0, 0]
        back = image_helper.bytes_to_image(image_helper.image_to_bytes(img))
        assert back.shape == (32, 32, 3)
        assert back[16, 16, 0] > 200 and back[16, 16, 1] < 60

    def test_random_lines_and_noise(self):
        rng = np.random.default_rng(0)
        img = np.zeros((40, 40, 3), np.uint8)
        lined = image_helper.random_lines(img, rng)
        assert lined.sum() > 0
        noised = image_helper.random_noise(img, rng, amount=0.1)
        assert (noised != img).any()
