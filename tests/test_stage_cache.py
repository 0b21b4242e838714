"""Epoch-persistent staging cache (`data/stage_cache.py`).

The cache must be invisible to training semantics: staged rows served
from the memmap must be byte-identical to freshly decoded ones, stale
caches (different labels / frame / max_boxes) must rebuild, and both
pipelines must produce identical batches with and without it."""

import numpy as np
import pytest
from PIL import Image

from tmv_tpu.data.stage_cache import StageCache, assign_rows
from tmv_tpu.data.yolo_pipeline import YoloDataPipeline


@pytest.fixture()
def dataset(tmp_path):
    rng = np.random.default_rng(3)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    lines = []
    for i in range(6):
        arr = rng.integers(0, 255, (80, 96, 3)).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"im{i}.jpg", quality=92)
        lines.append(f"im{i}.jpg|a,10,12,40,46|b,50,20,70,60|")
    (tmp_path / "labels.txt").write_text("\n".join(lines) + "\n")
    (tmp_path / "classes.txt").write_text("a\nb\n")
    return tmp_path


class TestStageCacheUnit:
    def _labels(self, dataset, n=3):
        return [{"image_path": str(dataset / "imgs" / f"im{i}.jpg"),
                 "boxes": [10.0, 12.0, 40.0, 46.0],
                 "classes": [0]} for i in range(n)]

    def test_miss_fill_hit_roundtrip(self, dataset, tmp_path):
        labels = self._labels(dataset)
        assign_rows(labels)
        cache = StageCache(str(tmp_path / "c"), labels, (32, 32), 5)
        assert cache.filled_count == 0
        assert cache.get(0) is None

        calls = []

        def stage(lb):
            calls.append(lb["_cache_row"])
            img = np.full((32, 32, 3), lb["_cache_row"] + 7, np.uint8)
            b = np.zeros((5, 4), np.float32) + lb["_cache_row"]
            c = np.zeros((5,), np.int32)
            v = np.zeros((5,), bool)
            v[0] = True
            return img, b, c, v

        first = [np.array(x) for x in cache.wrap(labels[1], stage)]
        assert calls == [1] and cache.filled_count == 1
        second = [np.array(x) for x in cache.wrap(labels[1], stage)]
        assert calls == [1]  # served from cache, no re-stage
        for a, b in zip(first, second):
            np.testing.assert_array_equal(a, b)
        assert second[3].dtype == np.bool_

    def test_reopen_persists_and_mismatch_rebuilds(self, dataset, tmp_path):
        labels = self._labels(dataset)
        assign_rows(labels)
        d = str(tmp_path / "c")
        cache = StageCache(d, labels, (32, 32), 5)
        cache.put(2, np.zeros((32, 32, 3), np.uint8),
                  np.zeros((5, 4), np.float32), np.zeros((5,), np.int32),
                  np.ones((5,), bool))
        # same fingerprint → reopen keeps the filled rows
        again = StageCache(d, labels, (32, 32), 5)
        assert again.filled_count == 1 and again.get(2) is not None
        # different max_boxes → stale, rebuilt empty
        rebuilt = StageCache(d, labels, (32, 32), 7)
        assert rebuilt.filled_count == 0
        # different labels (extra item) → stale too
        more = self._labels(dataset, n=4)
        assign_rows(more)
        rebuilt2 = StageCache(d, more, (32, 32), 7)
        assert rebuilt2.filled_count == 0


class TestYoloPipelineCache:
    def test_batches_identical_with_and_without_cache(self, dataset,
                                                      tmp_path):
        anchors = np.asarray(
            [[[6, 6], [8, 8], [10, 10]],
             [[12, 12], [16, 16], [20, 20]],
             [[24, 24], [28, 28], [32, 32]]], np.float32)
        kwargs = dict(
            image_path=str(dataset / "imgs"),
            label_path=str(dataset / "labels.txt"),
            classes_path=str(dataset / "classes.txt"),
            batch_size=2, anchors=anchors, image_wh=(64, 64),
            label_mean=False, seed=11, prefetch=0,
        )
        plain = YoloDataPipeline(**kwargs)
        cached = YoloDataPipeline(cache_dir=str(tmp_path / "c"), **kwargs)

        def take(pipe, n=4):
            it = iter(pipe)
            return [next(it) for _ in range(n)]

        ref = take(plain)
        cold = take(cached)  # epoch 1: fills the cache
        assert cached.cache.filled_count > 0
        warm_pipe = YoloDataPipeline(cache_dir=str(tmp_path / "c"),
                                     **kwargs)
        warm = take(warm_pipe)  # epoch 2: pure cache reads
        for a, b, c in zip(ref, cold, warm):
            np.testing.assert_array_equal(np.asarray(a["image"]),
                                          np.asarray(b["image"]))
            np.testing.assert_array_equal(np.asarray(a["image"]),
                                          np.asarray(c["image"]))
            for ta, tb, tc in zip(a["targets"], b["targets"], c["targets"]):
                np.testing.assert_array_equal(np.asarray(ta),
                                              np.asarray(tb))
                np.testing.assert_array_equal(np.asarray(ta),
                                              np.asarray(tc))


class TestPrefetchToDevice:
    def test_prefetched_batches_equal_synchronous(self, dataset):
        """The producer thread now runs H2D + the jitted aug/targets
        dispatch (prefetch-to-device); with a single producer the RNG-key
        sequence — and so every batch — must equal the prefetch=0 path."""
        anchors = np.asarray(
            [[[6, 6], [8, 8], [10, 10]],
             [[12, 12], [16, 16], [20, 20]],
             [[24, 24], [28, 28], [32, 32]]], np.float32)
        kwargs = dict(
            image_path=str(dataset / "imgs"),
            label_path=str(dataset / "labels.txt"),
            classes_path=str(dataset / "classes.txt"),
            batch_size=2, anchors=anchors, image_wh=(64, 64),
            label_mean=False, seed=11,
        )
        sync = YoloDataPipeline(prefetch=0, **kwargs)
        pre = YoloDataPipeline(prefetch=2, **kwargs)
        it_s, it_p = iter(sync), iter(pre)
        for _ in range(3):
            a, b = next(it_s), next(it_p)
            np.testing.assert_array_equal(np.asarray(a["image"]),
                                          np.asarray(b["image"]))
            for ta, tb in zip(a["targets"], b["targets"]):
                np.testing.assert_array_equal(np.asarray(ta),
                                              np.asarray(tb))


class TestPrefetchedUtility:
    def test_order_exhaustion_and_errors(self):
        from tmv_tpu.data.prefetch import prefetched

        assert list(prefetched(range(10), depth=3)) == list(range(10))
        assert list(prefetched(iter([1, 2]), depth=0)) == [1, 2]

        def boom():
            yield 1
            raise RuntimeError("x")

        it = prefetched(boom())
        assert next(it) == 1
        with pytest.raises(RuntimeError):
            next(it)


class TestEfficientDetPipelineCache:
    def test_device_aug_batches_identical(self, dataset, tmp_path):
        from tmv_tpu.data.efficientdet_pipeline import EfficientDetPipeline
        from tmv_tpu.ops.anchors import Anchors

        size = 64
        anchors = Anchors(3, 7, (size, size), 3,
                          [(1.0, 1.0), (1.4, 0.7), (0.7, 1.4)], 4.0)
        kwargs = dict(
            image_path=str(dataset / "imgs"),
            label_path=str(dataset / "labels.txt"),
            classes_path=str(dataset / "classes.txt"),
            batch_size=2, anchors=anchors, num_classes=3,
            image_size=size, augment=True, label_mean=False,
            device_aug=True, seed=5, prefetch=0,
        )
        plain = EfficientDetPipeline(**kwargs)
        cached = EfficientDetPipeline(cache_dir=str(tmp_path / "c"),
                                      **kwargs)
        a = next(iter(plain))
        b = next(iter(cached))
        assert cached.cache.filled_count > 0
        warm = EfficientDetPipeline(cache_dir=str(tmp_path / "c"), **kwargs)
        c = next(iter(warm))
        np.testing.assert_array_equal(np.asarray(a["image"]),
                                      np.asarray(b["image"]))
        np.testing.assert_array_equal(np.asarray(a["image"]),
                                      np.asarray(c["image"]))
        for k in ("boxes", "classes", "masks"):
            for la, lb, lc in zip(a[k], b[k], c[k]):
                np.testing.assert_array_equal(np.asarray(la),
                                              np.asarray(lb))
                np.testing.assert_array_equal(np.asarray(la),
                                              np.asarray(lc))

    def test_cache_requires_device_aug(self, dataset, tmp_path):
        from tmv_tpu.data.efficientdet_pipeline import EfficientDetPipeline
        from tmv_tpu.ops.anchors import Anchors

        anchors = Anchors(3, 7, (64, 64), 3, [(1.0, 1.0)], 4.0)
        with pytest.raises(ValueError, match="device_aug"):
            EfficientDetPipeline(
                str(dataset / "imgs"), str(dataset / "labels.txt"),
                str(dataset / "classes.txt"), 2, anchors, 3,
                image_size=64, augment=True, device_aug=False,
                cache_dir=str(tmp_path / "c"))
