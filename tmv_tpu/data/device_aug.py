"""Device-side EfficientDet augmentation: blur + affine + noise under jit.

The reference augments on the host with PIL/OpenCV *before* the letterbox
resize (`datasets/coco_dataset_one.py::get_random_data:73-156`: random
blur ksize 0-4, affine offset ±45 px / scale 0.5-2.0 about the center,
salt-and-pepper noise) — a per-sample Python chain that caps the train
feed rate on host-bound machines (measured: the PIL staging path, not the
TPU, is the D0 training bottleneck on few-core hosts).

This module is the TPU re-design, mirroring the YOLO pipeline's
host/device split (`data/yolo_pipeline.py`): the host only decodes +
letterboxes to the fixed network frame (native C++ when built), and the
whole augmentation chain runs as one jitted, batched XLA program in the
*target* frame:

- Gaussian blur with a traced radius (separable 17-tap depthwise conv,
  edge-extended like PIL; radius 0 lowers to the identity kernel);
- axis-aligned inverse-affine bilinear warp (scale + offset about the
  frame center — the reference disables rotation) with exact box
  tracking, zero fill outside the source;
- salt-and-pepper noise (2% of pixels → uniform random RGB).

Distribution notes vs the host path (deliberate, documented): the chain
runs after the letterbox instead of before it, so blur radii and pixel
offsets are expressed in *network-frame* pixels rather than source-image
pixels, and noise speckles are not softened by the subsequent resize.
The parameter ranges are identical; box geometry is exact.
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

_BLUR_HALF_WIDTH = 8  # 17-tap kernel: covers sigma≤4 (the max radius)


def gaussian_blur(img: jnp.ndarray, radius: jnp.ndarray) -> jnp.ndarray:
    """Separable Gaussian blur of an (H, W, C) image, traced ``radius``.

    ``radius`` is PIL's GaussianBlur radius (≈ sigma).  radius < 0.5
    lowers to the identity kernel, so a randomly-drawn integer radius of
    0 means "no blur" exactly like the host path's ``ksize == 0`` branch.
    Borders are edge-extended (PIL semantics), not zero-padded.
    """
    offs = jnp.arange(-_BLUR_HALF_WIDTH, _BLUR_HALF_WIDTH + 1,
                      dtype=jnp.float32)
    sigma = jnp.maximum(radius.astype(jnp.float32), 1e-3)
    w = jnp.exp(-0.5 * jnp.square(offs / sigma))
    w = jnp.where(radius < 0.5, (offs == 0).astype(jnp.float32), w)
    w = w / jnp.sum(w)

    c = img.shape[-1]
    x = jnp.pad(img[None], ((0, 0), (_BLUR_HALF_WIDTH, _BLUR_HALF_WIDTH),
                            (_BLUR_HALF_WIDTH, _BLUR_HALF_WIDTH), (0, 0)),
                mode="edge")
    kh = jnp.tile(w[:, None, None, None], (1, 1, 1, c))
    kw = jnp.tile(w[None, :, None, None], (1, 1, 1, c))
    dn = ("NHWC", "HWIO", "NHWC")
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), "VALID",
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x.shape, kh.shape, dn),
        feature_group_count=c)
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), "VALID",
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x.shape, kw.shape, dn),
        feature_group_count=c)
    return x[0]


def affine_warp(img: jnp.ndarray, sx, sy, dx, dy) -> jnp.ndarray:
    """Axis-aligned affine warp of an (H, W, C) image about its center.

    Forward map (host-path convention, `efficientdet_pipeline.py`):
    ``out(x, y) = in((x - tx)/sx, (y - ty)/sy)`` with
    ``tx = dx + W/2·(1-sx)``, ``ty = dy + H/2·(1-sy)`` — i.e. content is
    scaled by (sx, sy) about the center then shifted by (dx, dy).
    Bilinear, zero outside the source frame.  Separable gather (no
    rotation), so it lowers to two small matmul-like interpolations.
    """
    h, w = img.shape[0], img.shape[1]
    tx = dx + w / 2.0 * (1.0 - sx)
    ty = dy + h / 2.0 * (1.0 - sy)
    # PIL convention (host-path parity): map the output *pixel center*
    # (x+0.5) through the inverse matrix, then sample at center - 0.5
    src_x = (jnp.arange(w, dtype=jnp.float32) + 0.5 - tx) / sx - 0.5
    src_y = (jnp.arange(h, dtype=jnp.float32) + 0.5 - ty) / sy - 0.5
    in_x = (src_x >= 0) & (src_x <= w - 1)
    in_y = (src_y >= 0) & (src_y <= h - 1)
    x0 = jnp.clip(jnp.floor(src_x), 0, w - 1)
    y0 = jnp.clip(jnp.floor(src_y), 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    wx = jnp.clip(src_x, 0, w - 1) - x0
    wy = jnp.clip(src_y, 0, h - 1) - y0
    x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)
    y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)
    imgf = img.astype(jnp.float32)
    top = (imgf[y0i][:, x0i] * (1 - wx)[None, :, None]
           + imgf[y0i][:, x1i] * wx[None, :, None])
    bot = (imgf[y1i][:, x0i] * (1 - wx)[None, :, None]
           + imgf[y1i][:, x1i] * wx[None, :, None])
    out = top * (1 - wy)[:, None, None] + bot * wy[:, None, None]
    mask = (in_y[:, None] & in_x[None, :])[..., None]
    return jnp.where(mask, out, 0.0)


def affine_boxes(boxes: jnp.ndarray, hw: Tuple[int, int],
                 sx, sy, dx, dy) -> jnp.ndarray:
    """Track (N, 4) xyxy boxes through :func:`affine_warp` (exact — the
    same point formula as the host path), clipped to the frame."""
    h, w = hw
    tx = dx + w / 2.0 * (1.0 - sx)
    ty = dy + h / 2.0 * (1.0 - sy)
    out = boxes * jnp.stack([sx, sy, sx, sy]) + jnp.stack([tx, ty, tx, ty])
    return jnp.clip(out, 0.0, jnp.asarray([w, h, w, h], jnp.float32))


def salt_pepper(img01: jnp.ndarray, key, amount: float = 0.02):
    """2% of pixels replaced with uniform random RGB (host parity:
    `utils/image_helper.py::random_noise`)."""
    k_mask, k_col = jax.random.split(key)
    h, w, c = img01.shape
    mask = jax.random.uniform(k_mask, (h, w, 1)) < amount
    colors = jax.random.uniform(k_col, (h, w, c))
    return jnp.where(mask, colors, img01)


@partial(jax.jit, static_argnames=("image_size", "blur_max",
                                   "noise_amount"))
def efficientdet_augment_one(img_u8: jnp.ndarray, boxes: jnp.ndarray,
                             valid: jnp.ndarray, key,
                             image_size: int, blur_max: int = 4,
                             noise_amount: float = 0.02):
    """One staged image through the full device chain.

    Args:
        img_u8: (S, S, 3) uint8 letterboxed network-frame image.
        boxes: (N, 4) xyxy float boxes in the network frame (padded).
        valid: (N,) bool validity mask.
        key: PRNG key.

    Returns (img01 float32 in [0,1], boxes xyxy, valid) with the host
    path's parameter distribution: blur ksize randint(0, 4), scale
    uniform[0.5, 2.0), offset uniform[-45, 45).
    """
    k_blur, k_scale, k_off, k_noise = jax.random.split(key, 4)
    img01 = img_u8.astype(jnp.float32) / 255.0

    radius = jax.random.randint(k_blur, (), 0, blur_max + 1)
    img01 = gaussian_blur(img01, radius)

    s = jax.random.uniform(k_scale, (2,), minval=0.5, maxval=2.0)
    d = jax.random.uniform(k_off, (2,), minval=-45.0, maxval=45.0)
    sx, sy, dx, dy = s[0], s[1], d[0], d[1]
    img01 = affine_warp(img01, sx, sy, dx, dy)
    boxes = affine_boxes(boxes, (image_size, image_size), sx, sy, dx, dy)

    img01 = salt_pepper(img01, k_noise, noise_amount)

    wh = boxes[:, 2:4] - boxes[:, 0:2]
    valid = valid & (wh[:, 0] >= 2) & (wh[:, 1] >= 2)
    return jnp.clip(img01, 0.0, 1.0), boxes, valid
