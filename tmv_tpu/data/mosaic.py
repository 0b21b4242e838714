"""Device-side 4-image mosaic augmentation (jitted, static shapes).

The YOLOv4 paper's mosaic is listed as *not implemented* in the reference
(`yolo_v4/README.md:24`); the rebuild adds it as a batched XLA op, per the
driver's north-star ("mosaic augmentation fused into XLA/Pallas
preprocessing kernels").

Design: for output image ``i`` the four tiles are the staged batch images
``(i, p1[i], p2[i], p3[i])`` (random partner permutations — no extra host
decodes).  A random center ``(cx, cy)`` splits the canvas into TL/TR/BL/BR
rects; each source's full frame is affinely mapped into its rect (content
fit — aspect distortion folds into the downstream jitter augmentation, as
with the staging resize).  The composite is built with four bilinear
inverse-affine gathers selected by a quadrant mask — the same gather
pattern as ``yolo_pipeline._augment_one`` — so the whole batch lowers to
one fused XLA program.  Boxes ride the same affines; when the four tiles'
boxes exceed the ``max_boxes`` capacity the largest-area valid boxes win.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _bilinear_sample(img, src_y, src_x):
    """Sample (H,W,3) float image at float coord grids (h,), (w,)."""
    src_h, src_w = img.shape[0], img.shape[1]
    y0 = jnp.clip(jnp.floor(src_y), 0, src_h - 1)
    x0 = jnp.clip(jnp.floor(src_x), 0, src_w - 1)
    y1 = jnp.clip(y0 + 1, 0, src_h - 1)
    x1 = jnp.clip(x0 + 1, 0, src_w - 1)
    wy = jnp.clip(src_y, 0, src_h - 1) - y0
    wx = jnp.clip(src_x, 0, src_w - 1) - x0
    y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)
    x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)
    top = (img[y0i][:, x0i] * (1 - wx)[None, :, None]
           + img[y0i][:, x1i] * wx[None, :, None])
    bot = (img[y1i][:, x0i] * (1 - wx)[None, :, None]
           + img[y1i][:, x1i] * wx[None, :, None])
    return top * (1 - wy)[:, None, None] + bot * wy[:, None, None]


def _mosaic_one(imgs4, boxes4, classes4, valid4, center):
    """Compose one mosaic from 4 sources.

    Args:
        imgs4: (4, H, W, 3) float sources (TL, TR, BL, BR).
        boxes4: (4, N, 4) pixel xyxy; classes4 (4, N); valid4 (4, N).
        center: (cx, cy) float pixels.

    Returns (image (H,W,3), boxes (N,4), classes (N,), valid (N,)).
    """
    h, w = imgs4.shape[1], imgs4.shape[2]
    n = boxes4.shape[1]
    cx, cy = center[0], center[1]
    # quadrant rects (x0, y0, x1, y1)
    rects = jnp.stack([
        jnp.stack([0.0, 0.0, cx, cy]),          # TL
        jnp.stack([cx, 0.0, jnp.float32(w), cy]),   # TR
        jnp.stack([0.0, cy, cx, jnp.float32(h)]),   # BL
        jnp.stack([cx, cy, jnp.float32(w), jnp.float32(h)]),  # BR
    ])

    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)

    def sample_quadrant(q):
        x0, y0, x1, y1 = rects[q, 0], rects[q, 1], rects[q, 2], rects[q, 3]
        qw = jnp.maximum(x1 - x0, 1.0)
        qh = jnp.maximum(y1 - y0, 1.0)
        # output pixel → source coords (content fit: full frame → rect)
        src_y = (ys - y0) * (h / qh)
        src_x = (xs - x0) * (w / qw)
        return _bilinear_sample(imgs4[q], src_y, src_x)

    tiles = jnp.stack([sample_quadrant(q) for q in range(4)])  # (4,H,W,3)
    qid = ((ys[:, None] >= cy).astype(jnp.int32) * 2
           + (xs[None, :] >= cx).astype(jnp.int32))  # (H,W)
    image = jnp.take_along_axis(
        tiles, qid[None, :, :, None].astype(jnp.int32), axis=0)[0]

    # boxes: same affine per quadrant; clip to the rect
    def map_boxes(q):
        x0, y0, x1, y1 = rects[q, 0], rects[q, 1], rects[q, 2], rects[q, 3]
        sx = jnp.maximum(x1 - x0, 1.0) / w
        sy = jnp.maximum(y1 - y0, 1.0) / h
        b = boxes4[q] * jnp.stack([sx, sy, sx, sy]) + jnp.stack(
            [x0, y0, x0, y0])
        b = jnp.clip(b, jnp.stack([x0, y0, x0, y0]),
                     jnp.stack([x1, y1, x1, y1]))
        bw = b[:, 2] - b[:, 0]
        bh = b[:, 3] - b[:, 1]
        v = valid4[q] & (bw > 1) & (bh > 1)
        return b, v

    mapped = [map_boxes(q) for q in range(4)]
    all_boxes = jnp.concatenate([m[0] for m in mapped])      # (4N, 4)
    all_valid = jnp.concatenate([m[1] for m in mapped])      # (4N,)
    all_classes = jnp.concatenate(list(classes4))            # (4N,)

    # compact 4N → N: valid first, largest area first within valid
    area = ((all_boxes[:, 2] - all_boxes[:, 0])
            * (all_boxes[:, 3] - all_boxes[:, 1]))
    rank = jnp.where(all_valid, area, -1.0)
    _, sel = jax.lax.top_k(rank, n)
    return image, all_boxes[sel], all_classes[sel], all_valid[sel]


def mosaic_batch(images, boxes, classes, valid, key,
                 center_range: Tuple[float, float] = (0.3, 0.7),
                 prob: float = 1.0,
                 partners: Optional[jnp.ndarray] = None,
                 centers: Optional[jnp.ndarray] = None):
    """Batched mosaic: each output i composes sources (i, p1, p2, p3).

    Args:
        images: (B, H, W, 3) float (any range — passed through).
        boxes: (B, N, 4) pixel xyxy; classes (B, N); valid (B, N).
        key: PRNG key (partner permutations, centers, per-image gate).
        center_range: uniform range of the mosaic center, as a fraction
            of (W, H).
        prob: per-image probability of replacing it with its mosaic.
        partners: optional (3, B) int32 — explicit partner indices
            (tests); random permutations when None.
        centers: optional (B, 2) float pixel centers (tests).

    Returns (images, boxes, classes, valid) with identical shapes/dtypes.
    """
    b = images.shape[0]
    h, w = images.shape[1], images.shape[2]
    k_p1, k_p2, k_p3, k_c, k_gate = jax.random.split(key, 5)
    if partners is None:
        partners = jnp.stack([jax.random.permutation(k, b)
                              for k in (k_p1, k_p2, k_p3)])
    if centers is None:
        frac = jax.random.uniform(
            k_c, (b, 2), minval=center_range[0], maxval=center_range[1])
        centers = frac * jnp.asarray([w, h], jnp.float32)

    idx = jnp.stack([jnp.arange(b), partners[0], partners[1], partners[2]],
                    axis=1)  # (B, 4)
    imgs_f = images.astype(jnp.float32)

    def one(i4, center):
        return _mosaic_one(imgs_f[i4], boxes[i4], classes[i4], valid[i4],
                           center)

    m_img, m_boxes, m_classes, m_valid = jax.vmap(one)(idx, centers)

    gate = jax.random.uniform(k_gate, (b,)) < prob
    out_img = jnp.where(gate[:, None, None, None], m_img, imgs_f)
    out_boxes = jnp.where(gate[:, None, None], m_boxes, boxes)
    out_classes = jnp.where(gate[:, None], m_classes, classes)
    out_valid = jnp.where(gate[:, None], m_valid, valid)
    return (out_img.astype(images.dtype), out_boxes, out_classes, out_valid)
