"""Gaussian-heatmap soft labels for keypoint regression (UNet family).

Parity surface: `unet/soft_label.py:10-60` (scatter keypoints then convolve
with an analytic 2-D Gaussian, max-normalized per point) and
`unet/gaussian_kernel_2d.py:5-47`.

TPU re-design: out-of-range points are masked instead of skipped (static
shapes), and the per-point convolution loop collapses to one depthwise conv
over the point channels.
"""

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_2d(points: jax.Array, sigma: float = 1.0) -> jax.Array:
    """Gaussian value per ``[..., (y, x)]`` point (`gaussian_kernel_2d.py:5-17`).

    Note the reference's quirk: coordinates are pre-scaled by ``2 * sigma``.
    """
    y = points[..., 0] * 2.0 * sigma
    x = points[..., 1] * 2.0 * sigma
    return (
        1.0
        / (2.0 * math.pi * sigma**2)
        * math.e ** -((jnp.square(y) + jnp.square(x)) / (2.0 * sigma**2))
    )


def gaussian_kernel_2d(shape: Tuple[int, int, int, int], sigma: float = 1.0) -> np.ndarray:
    """Analytic Gaussian kernel ``(h, w, in_filters, out_filters)``.

    Grid spans [-1, 1) scaled by half-size (`gaussian_kernel_2d.py:20-47`).
    """
    h, w, in_f, out_f = shape
    h_half, w_half = h // 2, w // 2
    y = np.arange(-h_half, h - h_half, dtype=np.float32) / h_half
    x = np.arange(-w_half, w - w_half, dtype=np.float32) / w_half
    xv, yv = np.meshgrid(x, y)
    pts = np.stack([yv, xv], axis=-1)[:, :, None, None, :]
    pts = np.tile(pts, (1, 1, in_f, out_f, 1))
    g = np.asarray(gaussian_2d(jnp.asarray(pts), sigma))
    return g.astype(np.float32)


class SoftLabel:
    """Keypoints → per-point Gaussian heatmaps (`unet/soft_label.py:10-60`)."""

    def __init__(self, image_size: Tuple[int, int], points_num: int,
                 kernel_size: Tuple[int, int], sigma: float = 1.0):
        self.image_size = (int(image_size[0]), int(image_size[1]))
        self.points_num = points_num
        self.kernel_size = (int(kernel_size[0]), int(kernel_size[1]))
        # one shared 2-D kernel, applied depthwise over point channels
        self.kernel = jnp.asarray(
            gaussian_kernel_2d((*self.kernel_size, 1, 1), sigma)[:, :, 0, 0]
        )

    def get_target(self, points: jax.Array) -> jax.Array:
        """``(points_num, (y, x))`` int points → ``(H, W, points_num)`` heatmaps.

        Out-of-range points produce an all-zero channel (the reference skips
        the scatter, then 0/0-max-normalizes to NaN; we keep zeros — the
        only deliberate behavioral fix, as NaN targets poison training).
        """
        h, w = self.image_size
        p = self.points_num
        py = points[:, 0].astype(jnp.int32)
        px = points[:, 1].astype(jnp.int32)
        in_range = (py >= 0) & (px >= 0) & (py < h) & (px < w)
        chan = jnp.arange(p, dtype=jnp.int32)
        base = jnp.zeros((h, w, p), dtype=jnp.float32)
        y_idx = jnp.where(in_range, py, 0)
        x_idx = jnp.where(in_range, px, 0)
        impulses = base.at[y_idx, x_idx, chan].set(in_range.astype(jnp.float32))
        # depthwise conv: (1, H, W, P) * (kh, kw, 1, P), groups = P
        kernel = jnp.tile(self.kernel[:, :, None, None], (1, 1, 1, p))
        out = jax.lax.conv_general_dilated(
            impulses[None],
            kernel,
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=p,
        )[0]
        peak = jnp.max(out, axis=(0, 1), keepdims=True)
        return jnp.where(peak > 0, out / jnp.where(peak > 0, peak, 1.0), 0.0)
