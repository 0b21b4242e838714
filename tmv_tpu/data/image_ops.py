"""Device-side image preprocessing / augmentation (pure JAX, static shapes).

Capability parity with the reference's two augmentation paths:
- TF-graph augmentation for YOLO training
  (`datasets/coco_dataset.py:82-183`): random aspect/scale jitter, random
  placement with pad-or-crop, horizontal flip, HSV shift, plus box
  transform + degenerate-box filtering;
- letterbox helpers (`utils/tf_image_utils.py:10-62` ``ResizeWithPad`` and
  `utils/image_helper.py:293-330` ``opencvProportionalResize``).

TPU re-design: every op is jit/vmap-compatible with fixed output shapes;
variable numbers of boxes ride in padded (max_boxes, 4) arrays + masks, and
"filtering" sets mask bits instead of changing shapes.  Host code only
decodes JPEGs (PIL) and stacks batches — the math runs on device.
"""

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def load_image(path: str) -> np.ndarray:
    """Host JPEG decode → uint8 RGB (PIL; the reference uses decode_jpeg)."""
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))


def resize_with_pad(
    img: jax.Array,
    target_height: int,
    target_width: int,
    method: str = "bilinear",
    pad_offset: Tuple[jax.Array, jax.Array] | None = None,
):
    """Proportional letterbox: resize to fit, pad the rest.

    Matches ``ResizeWithPad`` (`tf_image_utils.py:10-62`): ratio =
    max(w/tw, h/th), floor-resized content, centered padding (or the given
    ``pad_offset``).  The *input* spatial shape must be static (JAX), the
    content scale is computed exactly like the reference.

    Returns (img, p_height, p_width, resized_h, resized_w, ratio) — the same
    6-tuple, as traced values.
    """
    h, w = img.shape[0], img.shape[1]
    f_h, f_w = float(h), float(w)
    ratio = max(f_w / target_width, f_h / target_height)
    resized_h_f = f_h / ratio
    resized_w_f = f_w / ratio
    resized_h = int(np.floor(resized_h_f))
    resized_w = int(np.floor(resized_w_f))
    p_h = max(0, int(np.floor((target_height - resized_h_f) / 2.0)))
    p_w = max(0, int(np.floor((target_width - resized_w_f) / 2.0)))
    if pad_offset is not None:
        p_h, p_w = pad_offset
    img = jax.image.resize(
        img.astype(jnp.float32), (resized_h, resized_w, img.shape[2]),
        method=method,
    )
    out = jnp.zeros((target_height, target_width, img.shape[2]), img.dtype)
    out = jax.lax.dynamic_update_slice(out, img, (p_h, p_w, 0))
    return out, p_h, p_w, resized_h, resized_w, ratio


def letterbox_params(src_hw, target_hw):
    """Static letterbox geometry: (ratio, pad_h, pad_w, new_h, new_w)."""
    f_h, f_w = float(src_hw[0]), float(src_hw[1])
    ratio = max(f_w / target_hw[1], f_h / target_hw[0])
    new_h = int(np.floor(f_h / ratio))
    new_w = int(np.floor(f_w / ratio))
    pad_h = max(0, int(np.floor((target_hw[0] - f_h / ratio) / 2.0)))
    pad_w = max(0, int(np.floor((target_hw[1] - f_w / ratio) / 2.0)))
    return ratio, pad_h, pad_w, new_h, new_w


def unletterbox_boxes(boxes, ratio, pad_w, pad_h, orig_w, orig_h,
                      normalized_size=None):
    """Map letterboxed-space boxes back to original pixels, clipped — the
    serving view's inverse transform (`views/object_detection.py:71-84`).

    ``normalized_size``: if boxes are in [0,1] of the letterboxed image,
    pass its (W, H) to convert to pixels first.
    """
    if normalized_size is not None:
        scale = jnp.asarray(
            [normalized_size[0], normalized_size[1]] * 2, jnp.float32
        )
        boxes = boxes * scale
    shift = jnp.asarray([pad_w, pad_h, pad_w, pad_h], jnp.float32)
    boxes = (boxes - shift) * ratio
    limit = jnp.asarray([orig_w, orig_h, orig_w, orig_h], jnp.float32)
    return jnp.clip(boxes, 0.0, limit)


def hsv_shift(img01: jax.Array, key: jax.Array, hue: float = 0.1,
              sat: float = 1.5, val: float = 1.5) -> jax.Array:
    """Random HSV distortion matching `coco_dataset.py:147-160`."""
    kh, ks1, ks2, kv1, kv2 = jax.random.split(key, 5)
    ch = jax.random.uniform(kh, (), minval=-hue, maxval=hue)
    s_up = jax.random.uniform(ks1, (), minval=1.0, maxval=sat)
    cs = jnp.where(jax.random.uniform(ks2) < 0.5, s_up, 1.0 / s_up)
    v_up = jax.random.uniform(kv1, (), minval=1.0, maxval=val)
    cv = jnp.where(jax.random.uniform(kv2) < 0.5, v_up, 1.0 / v_up)

    hsv = rgb_to_hsv(img01)
    h = hsv[..., 0:1] + ch
    h = jnp.where(h > 1.0, h - 1.0, h)
    h = jnp.where(h < 0.0, h + 1.0, h)
    s = hsv[..., 1:2] * cs
    v = hsv[..., 2:3] * cv
    hsv = jnp.clip(jnp.concatenate([h, s, v], axis=-1), 0.0, 1.0)
    return hsv_to_rgb(hsv)


def rgb_to_hsv(rgb: jax.Array) -> jax.Array:
    """Vectorized RGB→HSV on [0,1] floats (tf.image.rgb_to_hsv semantics)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    rangec = maxc - minc
    safe_range = jnp.where(rangec == 0, 1.0, rangec)
    s = jnp.where(maxc == 0, 0.0, rangec / jnp.where(maxc == 0, 1.0, maxc))
    rc = (maxc - r) / safe_range
    gc = (maxc - g) / safe_range
    bc = (maxc - b) / safe_range
    h = jnp.where(
        maxc == r, bc - gc,
        jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc),
    )
    h = jnp.where(rangec == 0, 0.0, (h / 6.0) % 1.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv: jax.Array) -> jax.Array:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.choose(i, [v, q, p, p, t, v], mode="clip")
    g = jnp.choose(i, [t, v, v, q, p, p], mode="clip")
    b = jnp.choose(i, [p, p, t, v, v, q], mode="clip")
    return jnp.stack([r, g, b], axis=-1)


def random_color(img: jax.Array, key: jax.Array) -> jax.Array:
    """One of brightness/contrast/hue/saturation jitter
    (`tf_image_utils.py:65-79` ``RandomColor``)."""
    k_type, k_param = jax.random.split(key)
    random_type = jax.random.randint(k_type, (), 0, 4)

    def brightness(im):
        delta = jax.random.uniform(k_param, (), minval=-0.2, maxval=0.2)
        return im + delta * 255.0

    def contrast(im):
        factor = jax.random.uniform(k_param, (), minval=0.2, maxval=0.5)
        mean = jnp.mean(im, axis=(0, 1), keepdims=True)
        return (im - mean) * factor + mean

    def hue(im):
        return im  # reference uses max_delta=0.0 → identity

    def saturation(im):
        factor = jax.random.uniform(k_param, (), minval=0.2, maxval=0.5)
        gray = jnp.mean(im, axis=-1, keepdims=True)
        return (im - gray) * factor + gray

    return jax.lax.switch(random_type, [brightness, contrast, hue, saturation], img)


def flip_boxes_lr(boxes: jax.Array, width: float) -> jax.Array:
    """Mirror xyxy boxes horizontally (`coco_dataset.py:172-174`)."""
    return jnp.concatenate(
        [width - boxes[..., 2:3], boxes[..., 1:2],
         width - boxes[..., 0:1], boxes[..., 3:4]], axis=-1,
    )
