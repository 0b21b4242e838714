"""EfficientDet training pipeline: host aug → device anchor targets.

Parity surface: `AIServer/ai_api/ai_models/datasets/coco_dataset_one.py`:
- same pipe-delimited label files, but class id 0 is reserved for
  background (ids are name-index + 1, `coco_dataset_one.py:29-37`) and boxes
  flow in yxyx order;
- host-side augmentation (`get_random_data:73-156`): random blur (ksize
  0–4), affine offset ±45 px / scale 0.5–2.0 (angles disabled, as in the
  reference), salt-and-pepper noise, proportional letterbox resize, clip,
  drop boxes smaller than 2 px;
- targets via ``Anchors.generate_targets`` inside the mapped stage
  (`GetDataSet:213-255`) — here one jitted vmapped device call per batch.
"""

import random
from typing import Dict, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from tmv_tpu.data.loaders import load_classes, load_labels
from tmv_tpu.data.samplers import ClassBalancedSampler
from tmv_tpu.data.yolo_targets import pad_labels
from tmv_tpu.ops.anchors import Anchors
from tmv_tpu.utils import image_helper


class EfficientDetPipeline:
    def __init__(self, image_path: str, label_path: str, classes_path: str,
                 batch_size: int, anchors: Anchors, num_classes: int,
                 image_size: int = 512, max_boxes: int = 100,
                 augment: bool = True, label_mean: bool = True,
                 seed: int = 0, with_raw_boxes: bool = False,
                 device_aug: bool = False, prefetch: int = 2,
                 cache_dir: str = None):
        self.classes, names_num = load_classes(classes_path)
        self.labels, self.labels_num = load_labels(
            label_path, image_path, self.classes)
        self.batch_size = batch_size
        self.anchors = anchors
        self.num_classes = num_classes
        self.image_size = image_size
        self.max_boxes = max_boxes
        self.augment = augment
        self.with_raw_boxes = with_raw_boxes
        self.device_aug = device_aug and augment
        self.prefetch = prefetch
        self.sampler = ClassBalancedSampler(self.labels, label_mean, seed)
        self._rng = random.Random(seed)
        self._np_rng = np.random.default_rng(seed)
        self.key = jax.random.key(seed)
        self.cache = None
        if cache_dir:
            if not self.device_aug:
                raise ValueError(
                    "cache_dir requires device_aug=True: only the fixed "
                    "staging frame is deterministic — the host-aug path "
                    "re-randomizes per epoch and is not cacheable")
            from tmv_tpu.data.stage_cache import StageCache, assign_rows
            from tmv_tpu.native import available as native_available

            assign_rows(self.labels)
            backend = "native" if native_available() else "pil"
            self.cache = StageCache(
                cache_dir, self.labels, (image_size, image_size),
                max_boxes, tag=f"efficientdet-stage-{backend}")

        def targets_fn(boxes, classes, valid):
            return jax.vmap(
                lambda b, c, v: anchors.generate_targets(
                    b, c, num_classes, valid=v)
            )(boxes, classes, valid)

        self._targets_fn = jax.jit(targets_fn)

        if self.device_aug:
            from tmv_tpu.data.device_aug import efficientdet_augment_one

            def aug_targets_fn(images_u8, boxes, classes, valid, key):
                keys = jax.random.split(key, images_u8.shape[0])

                def per_image(img, b, c, v, k):
                    img01, b, v = efficientdet_augment_one(
                        img, b, v, k, image_size)
                    by = b[:, jnp.asarray([1, 0, 3, 2])]  # xyxy → yxyx
                    bt, ct, mt = anchors.generate_targets(
                        by, c, num_classes, valid=v)
                    return img01, bt, ct, mt

                return jax.vmap(per_image)(images_u8, boxes, classes,
                                           valid, keys)

            self._aug_targets_fn = jax.jit(aug_targets_fn)

    def _get_random_data(self, label: Dict, seed: int = None):
        """``seed`` gives the item its own RNGs so staging can run on a
        thread pool (shared Random/Generator are not thread-safe)."""
        rng = self._rng if seed is None else random.Random(seed)
        np_rng = (self._np_rng if seed is None
                  else np.random.default_rng(seed))
        img = image_helper.bytes_to_image(
            open(label["image_path"], "rb").read())
        boxes = np.asarray(label["boxes"], np.float64).reshape(-1, 4)  # xyxy
        if self.augment:
            ksize = rng.randint(0, 4)
            if ksize > 0:
                img = image_helper.blur(img, ksize)
            # affine scale + offset (angles disabled in the reference)
            sx = rng.random() * 1.5 + 0.5
            sy = rng.random() * 1.5 + 0.5
            dx = rng.random() * 90 - 45
            dy = rng.random() * 90 - 45
            h, w = img.shape[:2]
            from PIL import Image

            # inverse affine for PIL: out(x,y) = in(a x + b y + c, …)
            coeffs = (1 / sx, 0, -(dx + w / 2 * (1 - sx)) / sx,
                      0, 1 / sy, -(dy + h / 2 * (1 - sy)) / sy)
            img = np.asarray(
                Image.fromarray(img).transform(
                    (w, h), Image.AFFINE, coeffs, Image.BILINEAR))
            pts = boxes.reshape(-1, 2)
            pts = pts * [sx, sy] + [
                dx + w / 2 * (1 - sx), dy + h / 2 * (1 - sy)]
            boxes = pts.reshape(-1, 4)
            img = image_helper.random_noise(img, np_rng)
        img, pts, _ = image_helper.proportional_resize(
            img, (self.image_size, self.image_size),
            points=boxes.reshape(-1, 2))
        boxes = pts.reshape(-1, 4)
        boxes[:, 0] = np.clip(boxes[:, 0], 0, self.image_size)
        boxes[:, 1] = np.clip(boxes[:, 1], 0, self.image_size)
        boxes[:, 2] = np.clip(boxes[:, 2], 0, self.image_size)
        boxes[:, 3] = np.clip(boxes[:, 3], 0, self.image_size)
        mask = ((boxes[:, 2] - boxes[:, 0] >= 2)
                & (boxes[:, 3] - boxes[:, 1] >= 2))
        boxes = boxes[mask][:, [1, 0, 3, 2]]  # xyxy → yxyx
        # background is class 0: shift ids (+1)
        classes = np.asarray(label["classes"], np.int32)[mask] + 1
        return img.astype(np.float32) / 255.0, boxes, classes

    def _stage_fixed(self, label: Dict):
        """Host staging for the ``device_aug`` path, served through the
        epoch-persistent memmap cache when ``cache_dir`` was given."""
        if self.cache is not None:
            return self.cache.wrap(label, self._stage_fixed_uncached)
        return self._stage_fixed_uncached(label)

    def _stage_fixed_uncached(self, label: Dict):
        """Host staging for the ``device_aug`` path: decode + letterbox to
        the fixed network frame ONLY (native C++ decoder when built —
        `native/preproc.cc`), uint8 out; all augmentation runs on-device
        (`data/device_aug.py`).  Mirrors `yolo_pipeline._stage_one`."""
        s = self.image_size
        path = label["image_path"]
        boxes = np.asarray(label["boxes"], np.float32).reshape(-1, 4)  # xyxy
        img_u8 = None
        if path.lower().endswith((".jpg", ".jpeg")):
            from tmv_tpu.native import available as native_available

            if native_available():
                from tmv_tpu.native import decode_letterbox

                with open(path, "rb") as f:
                    img01, meta = decode_letterbox(f.read(), (s, s))
                pad_y, pad_x, src_h, src_w = (int(x) for x in meta)
                ratio = max(src_w / s, src_h / s)
                boxes = boxes / ratio + np.asarray(
                    [pad_x, pad_y, pad_x, pad_y], np.float32)
                img_u8 = (img01 * 255.0).astype(np.uint8)
        if img_u8 is None:
            img = image_helper.bytes_to_image(open(path, "rb").read())
            img_u8, pts, _ = image_helper.proportional_resize(
                img, (s, s), points=boxes.reshape(-1, 2))
            boxes = np.asarray(pts, np.float32).reshape(-1, 4)
        classes = [c + 1 for c in label["classes"]]  # background = 0
        b, c, v = pad_labels(boxes, classes, self.max_boxes)
        return img_u8, b, c, v

    def _prefetched(self, produce_batch):
        """Run the whole batch build — host staging AND the device
        dispatch (H2D + jitted aug/targets program) — on a producer
        thread with a bounded queue, so per-batch input work (including
        the dispatch RPC on remote-attached TPUs) overlaps the consumer's
        train step (prefetch-to-device, mirrors `yolo_pipeline.__iter__`).
        ``prefetch=0`` stays synchronous; single producer thread keeps
        the RNG/batch sequence identical either way."""
        if self.prefetch <= 0:
            while True:
                yield produce_batch()
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)

        def producer():
            try:
                while True:
                    q.put(produce_batch())
            except BaseException as e:  # surface in the consumer
                q.put(e)

        threading.Thread(target=producer, daemon=True).start()
        while True:
            item = q.get()
            if isinstance(item, BaseException):
                raise item
            yield item

    def _iter_device_aug(self) -> Iterator[Dict]:
        from concurrent.futures import ThreadPoolExecutor

        it = iter(self.sampler)
        pool = (ThreadPoolExecutor(min(8, self.batch_size))
                if self.batch_size > 1 else None)

        def produce_batch():
            labels = [next(it) for _ in range(self.batch_size)]
            if pool is None:
                staged = [self._stage_fixed(lb) for lb in labels]
            else:
                staged = list(pool.map(self._stage_fixed, labels))
            imgs, boxes, classes, valid = (
                np.stack(z) for z in zip(*staged))
            self.key, sub = jax.random.split(self.key)
            images01, boxes_t, classes_t, masks_t = self._aug_targets_fn(
                jnp.asarray(imgs), jnp.asarray(boxes),
                jnp.asarray(classes), jnp.asarray(valid), sub)
            return {"image": images01, "boxes": boxes_t,
                    "classes": classes_t, "masks": masks_t}

        yield from self._prefetched(produce_batch)

    def __iter__(self) -> Iterator[Dict]:
        if self.device_aug:
            return self._iter_device_aug()
        return self._iter_host_aug()

    def _iter_host_aug(self) -> Iterator[Dict]:
        from concurrent.futures import ThreadPoolExecutor

        it = iter(self.sampler)
        pool = (ThreadPoolExecutor(min(8, self.batch_size))
                if self.batch_size > 1 else None)

        def produce_batch():
            items = [(next(it), self._rng.getrandbits(32))
                     for _ in range(self.batch_size)]
            if pool is None:
                staged = [self._get_random_data(lb, sd) for lb, sd in items]
            else:
                staged = list(pool.map(
                    lambda a: self._get_random_data(*a), items))
            imgs, boxes_l, classes_l, valid_l, raw = [], [], [], [], []
            for img, boxes, classes in staged:
                b, c, v = pad_labels(boxes, classes.tolist(), self.max_boxes)
                imgs.append(img)
                boxes_l.append(b)
                classes_l.append(c)
                valid_l.append(v)
                if self.with_raw_boxes:
                    raw.append((boxes, classes))
            boxes_t, classes_t, masks_t = self._targets_fn(
                jnp.asarray(np.stack(boxes_l)),
                jnp.asarray(np.stack(classes_l)),
                jnp.asarray(np.stack(valid_l)),
            )
            batch = {
                "image": jnp.asarray(np.stack(imgs)),
                "boxes": boxes_t,
                "classes": classes_t,
                "masks": masks_t,
            }
            if self.with_raw_boxes:
                batch["raw"] = raw
            return batch

        yield from self._prefetched(produce_batch)
