"""YOLO training data pipeline: sampler → host decode → device aug+targets.

Capability parity with ``DataGenerator`` (`datasets/coco_dataset.py:16-345`):
class-balanced sampling, the random aspect/scale/place/flip/HSV augmentation,
grid-target assignment, batching and prefetch.

TPU re-design of the host/device split: the host thread only decodes JPEGs
and resizes them to a *fixed* staging resolution (content letterboxed), so
every downstream step — scale/aspect jitter, placement, flip, HSV, target
scatter — is one jitted, batched device program (`_augment_and_targets`).
This replaces tf.data's per-sample ``map`` graphs with batch-level XLA and
keeps the TPU input pipeline free of dynamic shapes.
"""

from typing import Dict, Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tmv_tpu.data.image_ops import flip_boxes_lr, hsv_shift, load_image
from tmv_tpu.data.loaders import load_anchors, load_classes, load_labels
from tmv_tpu.data.samplers import ClassBalancedSampler
from tmv_tpu.data.yolo_targets import make_yolo_targets, pad_labels


def _augment_one(img, boxes, valid, key, image_wh, jitter, hue, sat, val,
                 flip, src_wh):
    """Device-side augmentation of one staged image.

    Matches `coco_dataset.py:112-183`: random aspect (new_ar), random scale
    (0.25..2), random placement, flip, HSV.  The staged image is already at
    (H, W) with content occupying the full frame (host resizes exactly to
    the staging size, distorting aspect; the aspect jitter folds the
    correction in, preserving the reference's *distribution* of crops).
    """
    w, h = image_wh
    k_ar1, k_ar2, k_scale, k_dx, k_dy, k_flip, k_hsv = jax.random.split(key, 7)
    new_ar = (w / h) * (
        jax.random.uniform(k_ar1, (), minval=1 - jitter, maxval=1 + jitter)
        / jax.random.uniform(k_ar2, (), minval=1 - jitter, maxval=1 + jitter)
    )
    scale = jax.random.uniform(k_scale, (), minval=0.25, maxval=2.0)
    nh = jnp.where(new_ar < 1, jnp.floor(scale * h),
                   jnp.floor(jnp.floor(scale * w) / new_ar))
    nw = jnp.where(new_ar < 1, jnp.floor(nh * new_ar), jnp.floor(scale * w))

    # resize content to (nh, nw) inside an (h, w) canvas at offset (dy, dx):
    # implemented as one inverse-affine gather (scale + translate), the
    # XLA-friendly equivalent of resize + PadOrCropToBoundingBox.
    dx = jnp.floor(jax.random.uniform(k_dx, (), minval=0.0, maxval=1.0) * (w - nw))
    dy = jnp.floor(jax.random.uniform(k_dy, (), minval=0.0, maxval=1.0) * (h - nh))

    src_h, src_w = img.shape[0], img.shape[1]
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    src_y = (ys - dy) * (src_h / nh)
    src_x = (xs - dx) * (src_w / nw)
    in_y = (src_y >= 0) & (src_y <= src_h - 1)
    in_x = (src_x >= 0) & (src_x <= src_w - 1)
    y0 = jnp.clip(jnp.floor(src_y), 0, src_h - 1)
    x0 = jnp.clip(jnp.floor(src_x), 0, src_w - 1)
    y1 = jnp.clip(y0 + 1, 0, src_h - 1)
    x1 = jnp.clip(x0 + 1, 0, src_w - 1)
    wy = jnp.clip(src_y, 0, src_h - 1) - y0
    wx = jnp.clip(src_x, 0, src_w - 1) - x0
    y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)
    x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)
    imgf = img.astype(jnp.float32)
    top = imgf[y0i][:, x0i] * (1 - wx)[None, :, None] + imgf[y0i][:, x1i] * wx[None, :, None]
    bot = imgf[y1i][:, x0i] * (1 - wx)[None, :, None] + imgf[y1i][:, x1i] * wx[None, :, None]
    out = top * (1 - wy)[:, None, None] + bot * wy[:, None, None]
    mask2d = (in_y[:, None] & in_x[None, :])[..., None]
    out = jnp.where(mask2d, out, 0.0)

    # boxes: from source pixels → canvas pixels
    sx = nw / src_w
    sy = nh / src_h
    boxes = boxes * jnp.asarray([sx, sy, sx, sy]) + jnp.asarray([dx, dy, dx, dy])
    boxes = jnp.clip(boxes, 0.0, jnp.asarray([w, h, w, h], jnp.float32))

    do_flip = flip & (jax.random.uniform(k_flip) < 0.5)
    out = jnp.where(do_flip, out[:, ::-1, :], out)
    boxes = jnp.where(do_flip, flip_boxes_lr(boxes, float(w)), boxes)

    out = hsv_shift(out / 255.0, k_hsv, hue, sat, val)

    boxes_wh = boxes[:, 2:4] - boxes[:, 0:2]
    valid = valid & (boxes_wh[:, 0] > 1) & (boxes_wh[:, 1] > 1)
    return out, boxes, valid


class YoloDataPipeline:
    """End-to-end pipeline yielding device-ready batches.

    Batch dict: ``image`` (B, H, W, 3) float [0,1]; ``targets`` tuple of
    per-scale grids — the exact structures ``make_yolo_loss_fn`` consumes.
    """

    def __init__(
        self,
        image_path: str,
        label_path: str,
        classes_path: str,
        batch_size: int,
        anchors: np.ndarray,
        image_wh: Tuple[int, int] = (416, 416),
        label_mean: bool = True,
        image_random: bool = True,
        jitter: float = 0.3,
        hue: float = 0.1,
        sat: float = 1.5,
        val: float = 1.5,
        flip: bool = True,
        mosaic: float = 0.0,
        max_boxes: int = 100,
        seed: int = 0,
        prefetch: int = 2,
        cache_dir: str = None,
    ):
        self.classes, self.classes_num = load_classes(classes_path)
        self.labels, self.labels_num = load_labels(
            label_path, image_path, self.classes
        )
        self.batch_size = batch_size
        self.anchors_wh = np.asarray(anchors)
        self.image_wh = image_wh
        self.image_random = image_random
        self.aug = dict(jitter=jitter, hue=hue, sat=sat, val=val, flip=flip)
        self.mosaic = mosaic
        self.max_boxes = max_boxes
        self.sampler = ClassBalancedSampler(self.labels, label_mean, seed)
        self.key = jax.random.key(seed)
        self.prefetch = prefetch
        self._pool = None
        self.cache = None
        if cache_dir:
            from tmv_tpu.data.stage_cache import StageCache, assign_rows
            from tmv_tpu.native import available as native_available

            assign_rows(self.labels)
            backend = "native" if native_available() else "pil"
            self.cache = StageCache(
                cache_dir, self.labels, (image_wh[1], image_wh[0]),
                max_boxes, tag=f"yolo-stage-{backend}")
        self._build_device_fns()

    def _build_device_fns(self):
        image_wh = self.image_wh
        anchors = self.anchors_wh
        classes_num = self.classes_num
        aug = self.aug
        random_on = self.image_random

        mosaic_prob = self.mosaic

        def batch_fn(images, boxes, classes, valid, key):
            if random_on and mosaic_prob > 0:
                from tmv_tpu.data.mosaic import mosaic_batch

                key, k_m = jax.random.split(key)
                images, boxes, classes, valid = mosaic_batch(
                    images, boxes, classes, valid, k_m, prob=mosaic_prob)
            keys = jax.random.split(key, images.shape[0])

            def per_image(img, bxs, cls, vld, k):
                if random_on:
                    img01, bxs, vld = _augment_one(
                        img, bxs, vld, k, image_wh, aug["jitter"], aug["hue"],
                        aug["sat"], aug["val"], aug["flip"],
                        (image_wh[1], image_wh[0]),
                    )
                else:
                    img01 = img.astype(jnp.float32) / 255.0
                targets = make_yolo_targets(
                    bxs, cls, vld, anchors, image_wh, classes_num
                )
                return img01, targets

            return jax.vmap(per_image)(images, boxes, classes, valid, keys)

        self._batch_fn = jax.jit(batch_fn)

    def _stage_one(self, label: Dict):
        """Host: decode + resize to the staging resolution, through the
        epoch-persistent memmap cache when ``cache_dir`` was given
        (`data/stage_cache.py` — staging is deterministic; all
        augmentation randomness runs on device downstream)."""
        if self.cache is not None:
            return self.cache.wrap(label, self._stage_one_uncached)
        return self._stage_one_uncached(label)

    def _stage_one_uncached(self, label: Dict):
        """Host: decode + resize to the staging resolution.

        Uses the native C++ decoder (`native/preproc.cc`) when built —
        fused JPEG decode + resize without the Python imaging stack."""
        w, h = self.image_wh
        path = label["image_path"]
        if path.lower().endswith((".jpg", ".jpeg")):
            from tmv_tpu.native import available as native_available

            if native_available():
                from tmv_tpu.native import decode_letterbox

                with open(path, "rb") as f:
                    img01, meta = decode_letterbox(f.read(), (h, w))
                pad_y, pad_x, src_h, src_w = (int(x) for x in meta)
                ratio = max(src_w / w, src_h / h)
                boxes = np.asarray(label["boxes"], np.float32).reshape(-1, 4)
                boxes = boxes / ratio + np.asarray(
                    [pad_x, pad_y, pad_x, pad_y], np.float32)
                b, c, v = pad_labels(boxes, label["classes"], self.max_boxes)
                return (img01 * 255.0).astype(np.uint8), b, c, v
        img = load_image(path)
        src_h, src_w = img.shape[0], img.shape[1]
        # PIL resize to exactly (h, w); boxes scale accordingly
        from PIL import Image

        im = Image.fromarray(img).resize((w, h), Image.BILINEAR)
        boxes = np.asarray(label["boxes"], np.float32).reshape(-1, 4)
        boxes = boxes * np.asarray(
            [w / src_w, h / src_h, w / src_w, h / src_h], np.float32
        )
        b, c, v = pad_labels(boxes, label["classes"], self.max_boxes)
        return np.asarray(im), b, c, v

    def _stage_batch(self, labels):
        """Host: stage a whole batch, fanning JPEG decodes over threads
        (the native decoder and PIL both release the GIL)."""
        if self._pool is None:
            staged = [self._stage_one(lb) for lb in labels]
        else:
            staged = list(self._pool.map(self._stage_one, labels))
        imgs, boxes, classes, valid = zip(*staged)
        return (np.stack(imgs), np.stack(boxes), np.stack(classes),
                np.stack(valid))

    def _device_batch(self, staged) -> Dict:
        """H2D + the jitted aug/targets program for one staged batch."""
        imgs, boxes, classes, valid = staged
        self.key, sub = jax.random.split(self.key)
        images01, targets = self._batch_fn(
            jnp.asarray(imgs),
            jnp.asarray(boxes),
            jnp.asarray(classes),
            jnp.asarray(valid),
            sub,
        )
        return {"image": images01, "targets": targets}

    def __iter__(self) -> Iterator[Dict]:
        """Prefetch-to-device: the producer thread runs host staging AND
        the device batch-build (H2D transfer + the jitted aug/targets
        dispatch), so per-batch input work — including the dispatch RPC
        on remote-attached TPUs — overlaps the consumer's train step
        instead of serializing with it.  Single producer thread ⇒ the
        RNG-key sequence (and therefore every batch) is identical to the
        synchronous ``prefetch=0`` path."""
        import queue
        import threading
        from concurrent.futures import ThreadPoolExecutor

        it = iter(self.sampler)
        self._pool = (ThreadPoolExecutor(min(8, self.batch_size))
                      if self.batch_size > 1 else None)

        def produce(q: "queue.Queue", stop: threading.Event):
            try:
                while not stop.is_set():
                    labels = [next(it) for _ in range(self.batch_size)]
                    q.put(self._device_batch(self._stage_batch(labels)))
            except BaseException as e:  # surface in the consumer
                q.put(e)

        if self.prefetch > 0:
            q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
            stop = threading.Event()
            t = threading.Thread(target=produce, args=(q, stop), daemon=True)
            t.start()

            while True:
                item = q.get()
                if isinstance(item, BaseException):
                    raise item
                yield item
        else:
            while True:
                labels = [next(it) for _ in range(self.batch_size)]
                yield self._device_batch(self._stage_batch(labels))
