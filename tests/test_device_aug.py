"""Device-side EfficientDet augmentation (`data/device_aug.py`).

Geometry oracle: the box transform must match the host PIL path's point
formula (`data/efficientdet_pipeline.py::_get_random_data`) exactly, and
the warp must match PIL's inverse-coefficient affine within bilinear
tolerance on smooth content.
"""

import numpy as np
import jax
import jax.numpy as jnp

from tmv_tpu.data.device_aug import (
    affine_boxes,
    affine_warp,
    efficientdet_augment_one,
    gaussian_blur,
    salt_pepper,
)


class TestAffine:
    def test_identity(self, rng):
        img = jnp.asarray(rng.uniform(size=(33, 47, 3)).astype(np.float32))
        out = affine_warp(img, 1.0, 1.0, 0.0, 0.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(img),
                                   atol=1e-6)

    def test_boxes_match_host_formula(self, rng):
        h = w = 64
        sx, sy, dx, dy = 1.37, 0.81, 11.5, -7.25
        boxes = rng.uniform(5, 50, size=(6, 4)).astype(np.float32)
        out = np.asarray(affine_boxes(jnp.asarray(boxes), (h, w),
                                      sx, sy, dx, dy))
        # host path: pts * [sx, sy] + [dx + w/2(1-sx), dy + h/2(1-sy)]
        pts = boxes.reshape(-1, 2)
        pts = pts * [sx, sy] + [dx + w / 2 * (1 - sx),
                                dy + h / 2 * (1 - sy)]
        expected = np.clip(pts.reshape(-1, 4), 0, [w, h, w, h])
        np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-4)

    def test_warp_matches_pil_on_smooth_content(self, rng):
        from PIL import Image

        h = w = 48
        sx, sy, dx, dy = 1.6, 0.7, 9.0, -5.0
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        img = np.stack([xx / w, yy / h, (xx + yy) / (h + w)],
                       axis=-1) * 200 + 20
        # PIL inverse coefficients, exactly as the host pipeline builds them
        coeffs = (1 / sx, 0, -(dx + w / 2 * (1 - sx)) / sx,
                  0, 1 / sy, -(dy + h / 2 * (1 - sy)) / sy)
        ref = np.asarray(Image.fromarray(img.astype(np.uint8)).transform(
            (w, h), Image.AFFINE, coeffs, Image.BILINEAR), np.float32)
        out = np.asarray(affine_warp(jnp.asarray(img), sx, sy, dx, dy))
        # compare where BOTH have content, eroded 2px (the zero-fill seam
        # differs by the sub-pixel boundary rounding)
        interior = (ref > 0).all(axis=-1) & (out > 0).all(axis=-1)
        for axis in (0, 1):
            for shift in (-2, -1, 1, 2):
                interior &= np.roll(interior, shift, axis=axis)
        assert interior.sum() > 0.25 * interior.size
        diff = np.abs(out - ref)[interior]
        assert np.percentile(diff, 99) < 3.0, np.percentile(diff, 99)


class TestBlurNoise:
    def test_blur_radius_zero_is_identity(self, rng):
        img = jnp.asarray(rng.uniform(size=(16, 16, 3)).astype(np.float32))
        out = gaussian_blur(img, jnp.asarray(0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(img),
                                   atol=1e-6)

    def test_blur_preserves_constants_and_smooths(self, rng):
        const = jnp.ones((20, 20, 3), jnp.float32) * 0.6
        out = gaussian_blur(const, jnp.asarray(3))
        np.testing.assert_allclose(np.asarray(out), 0.6, atol=1e-5)
        noise = jnp.asarray(rng.uniform(size=(32, 32, 3)).astype(np.float32))
        blurred = gaussian_blur(noise, jnp.asarray(3))
        assert float(jnp.std(blurred)) < 0.4 * float(jnp.std(noise))

    def test_salt_pepper_fraction(self, rng):
        img = jnp.zeros((128, 128, 3), jnp.float32) + 0.5
        out = np.asarray(salt_pepper(img, jax.random.key(0), amount=0.02))
        frac = np.mean(np.any(out != 0.5, axis=-1))
        assert 0.005 < frac < 0.05, frac


class TestAugmentOne:
    def test_shapes_dtype_and_validity(self, rng):
        s = 64
        img = jnp.asarray(
            rng.integers(0, 255, (s, s, 3)).astype(np.uint8))
        boxes = jnp.asarray(
            [[10.0, 10.0, 30.0, 30.0],
             [20.0, 20.0, 21.0, 21.0],  # 1px → must drop post-warp
             [0.0, 0.0, 0.0, 0.0]], jnp.float32)
        valid = jnp.asarray([True, True, False])
        img01, b, v = efficientdet_augment_one(
            img, boxes, valid, jax.random.key(3), s)
        assert img01.shape == (s, s, 3) and img01.dtype == jnp.float32
        assert float(jnp.min(img01)) >= 0 and float(jnp.max(img01)) <= 1
        assert not bool(v[2])  # padding never becomes valid
        assert b.shape == boxes.shape

    def test_deterministic_under_key(self, rng):
        s = 32
        img = jnp.asarray(
            rng.integers(0, 255, (s, s, 3)).astype(np.uint8))
        boxes = jnp.asarray([[4.0, 4.0, 20.0, 24.0]], jnp.float32)
        valid = jnp.asarray([True])
        a = efficientdet_augment_one(img, boxes, valid,
                                     jax.random.key(7), s)
        b = efficientdet_augment_one(img, boxes, valid,
                                     jax.random.key(7), s)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestPipelineDeviceAug:
    def test_e2e_batch_well_formed(self, tmp_path, rng):
        from PIL import Image

        from tmv_tpu.data.efficientdet_pipeline import EfficientDetPipeline
        from tmv_tpu.ops.anchors import Anchors

        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        lines = []
        for i in range(4):
            arr = rng.integers(0, 255, (80, 96, 3)).astype(np.uint8)
            Image.fromarray(arr).save(img_dir / f"im{i}.jpg")
            lines.append(f"im{i}.jpg|a,10,12,40,46|b,50,20,70,60|")
        (tmp_path / "labels.txt").write_text("\n".join(lines) + "\n")
        (tmp_path / "classes.txt").write_text("a\nb\n")

        size = 64
        anchors = Anchors(3, 7, (size, size), 3,
                          [(1.0, 1.0), (1.4, 0.7), (0.7, 1.4)], 4.0)
        kwargs = dict(batch_size=2, anchors=anchors, num_classes=3,
                      image_size=size, augment=True, label_mean=False)
        pipe_dev = EfficientDetPipeline(
            str(img_dir), str(tmp_path / "labels.txt"),
            str(tmp_path / "classes.txt"), device_aug=True, **kwargs)
        pipe_host = EfficientDetPipeline(
            str(img_dir), str(tmp_path / "labels.txt"),
            str(tmp_path / "classes.txt"), **kwargs)
        b_dev = next(iter(pipe_dev))
        b_host = next(iter(pipe_host))
        assert b_dev["image"].shape == b_host["image"].shape
        img = np.asarray(b_dev["image"])
        assert np.isfinite(img).all() and img.min() >= 0 and img.max() <= 1
        for k in ("boxes", "classes", "masks"):
            assert len(b_dev[k]) == len(b_host[k]), k
            for lvl_d, lvl_h in zip(b_dev[k], b_host[k]):
                assert lvl_d.shape == lvl_h.shape, k
                assert np.isfinite(np.asarray(lvl_d, np.float32)).all()
        # some anchors must be assigned foreground across the batch
        fg = sum(float(np.asarray(m).sum()) for m in b_dev["masks"])
        assert fg > 0


class TestParameterDistribution:
    def test_affine_params_match_host_ranges(self):
        """Recover (sx, sy, dx, dy) from the exact box transform over many
        keys and pin the host path's parameter distribution: scale uniform
        [0.5, 2.0), offset uniform [-45, 45) (`_get_random_data`)."""
        s = 64
        img = jnp.zeros((s, s, 3), jnp.uint8)
        # unit square at a known spot: corners recover the affine exactly
        boxes = jnp.asarray([[10.0, 12.0, 20.0, 26.0]], jnp.float32)
        valid = jnp.asarray([True])
        sxs, dxs = [], []
        for i in range(200):
            _, b, _ = efficientdet_augment_one(
                img, boxes, valid, jax.random.key(i), s)
            b = np.asarray(b)[0]
            # clip-free region check: skip samples whose box hit the frame
            if b[0] <= 0 or b[1] <= 0 or b[2] >= s or b[3] >= s:
                continue
            sx = (b[2] - b[0]) / 10.0
            tx = b[0] - 10.0 * sx
            dx = tx - s / 2.0 * (1.0 - sx)
            sxs.append(sx)
            dxs.append(dx)
        sxs, dxs = np.asarray(sxs), np.asarray(dxs)
        assert len(sxs) > 50
        assert sxs.min() >= 0.5 - 1e-4 and sxs.max() < 2.0 + 1e-4
        assert dxs.min() >= -45.0 - 1e-3 and dxs.max() < 45.0 + 1e-3
        # both halves of each range get hit (uniform, not degenerate)
        assert (sxs < 1.0).any() and (sxs > 1.3).any()
        assert (dxs < -10).any() and (dxs > 10).any()
