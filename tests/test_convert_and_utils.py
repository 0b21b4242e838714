import io
import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest


class TestDarknetRoundTrip:
    def test_yolo_v3_roundtrip(self, rng):
        from tmv_tpu.convert.darknet import (
            load_darknet_weights, save_darknet_weights, jax_to_numpy,
        )
        from tmv_tpu.models.yolo_v3 import YoloV3

        m = YoloV3(classes_num=2)
        v = m.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False)
        params = jax_to_numpy(v["params"])
        stats = jax_to_numpy(v["batch_stats"])
        # randomize so the roundtrip is meaningful
        params = jax.tree.map(
            lambda a: rng.normal(size=a.shape).astype(np.float32), params)
        stats = jax.tree.map(
            lambda a: rng.uniform(0.5, 1.5, size=a.shape).astype(np.float32),
            stats)
        buf = io.BytesIO()
        save_darknet_weights(params, stats, buf)
        buf.seek(0)
        p2, s2 = load_darknet_weights(v["params"], v["batch_stats"], buf)
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(stats),
                        jax.tree_util.tree_leaves(s2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_yolo_v4_roundtrip(self, rng):
        from tmv_tpu.convert.darknet import (
            load_darknet_weights, save_darknet_weights, jax_to_numpy,
        )
        from tmv_tpu.models.yolo_v4 import YoloV4

        m = YoloV4(classes_num=2)
        v = m.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False)
        params = jax.tree.map(
            lambda a: rng.normal(size=a.shape).astype(np.float32),
            jax_to_numpy(v["params"]))
        stats = jax.tree.map(
            lambda a: rng.uniform(0.5, 1.5, size=a.shape).astype(np.float32),
            jax_to_numpy(v["batch_stats"]))
        buf = io.BytesIO()
        save_darknet_weights(params, stats, buf)
        buf.seek(0)
        p2, s2 = load_darknet_weights(v["params"], v["batch_stats"], buf)
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_stream_length_mismatch_raises(self, rng):
        from tmv_tpu.convert.darknet import (
            load_darknet_weights, save_darknet_weights,
        )
        from tmv_tpu.models.yolo_v3 import YoloV3

        m = YoloV3(classes_num=2)
        v = m.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False)
        buf = io.BytesIO()
        save_darknet_weights(v["params"], v["batch_stats"], buf)
        buf.write(b"\x00" * 16)  # trailing garbage
        buf.seek(0)
        with pytest.raises(ValueError):
            load_darknet_weights(v["params"], v["batch_stats"], buf)


class TestCocoConvert:
    def test_convert(self, tmp_path):
        from tmv_tpu.utils.coco_convert import coco_to_labels
        from tmv_tpu.data.loaders import load_classes, load_labels

        ann = {
            "images": [{"id": 1, "file_name": "a.jpg"},
                       {"id": 2, "file_name": "b.jpg"}],
            "annotations": [
                {"image_id": 1, "category_id": 10,
                 "bbox": [10, 20, 30, 40], "iscrowd": 0},
                {"image_id": 1, "category_id": 11,
                 "bbox": [1, 2, 3, 4], "iscrowd": 0},
                {"image_id": 2, "category_id": 10,
                 "bbox": [5, 5, 10, 10], "iscrowd": 1},  # crowd: skipped
            ],
            "categories": [{"id": 10, "name": "cat"},
                           {"id": 11, "name": "dog"}],
        }
        ann_file = tmp_path / "inst.json"
        ann_file.write_text(json.dumps(ann))
        labels_path, classes_path = coco_to_labels(
            str(ann_file), str(tmp_path), "val")
        classes, n = load_classes(classes_path)
        assert classes == ["cat", "dog"]
        labels, ln = load_labels(labels_path, str(tmp_path), classes)
        assert ln == 2
        assert labels[0]["classes"] == [0, 1]
        np.testing.assert_allclose(labels[0]["boxes"][0], [10, 20, 40, 60])
        assert labels[1]["classes"] == []  # crowd-only image


class TestKmeansAnchors:
    def test_clusters_recover_modes(self, rng):
        from tmv_tpu.utils.kmeans_anchors import kmeans_wh
        modes = np.array([[10, 10], [50, 30], [120, 100]], np.float64)
        boxes = np.concatenate([
            m + rng.normal(0, 1.0, size=(200, 2)) for m in modes
        ])
        clusters = kmeans_wh(boxes, k=3, seed=1)
        for m in modes:
            assert np.abs(clusters - m).sum(axis=1).min() < 6

    def test_labels_file_parse(self, tmp_path, rng):
        from tmv_tpu.utils.kmeans_anchors import boxes_from_labels_file
        p = tmp_path / "labels.txt"
        p.write_text("a.jpg|cat,0,0,10,20|dog,5,5,8,9|\nb.jpg|\n")
        whs = boxes_from_labels_file(str(p))
        np.testing.assert_allclose(whs, [[10, 20], [3, 4]])


class TestDemoModel:
    def test_forward_and_loss(self, rng):
        from tmv_tpu.models.efficientdet.demo import DemoModel, make_demo_loss_fn
        m = DemoModel(num_classes=5)
        x = jnp.zeros((1, 128, 128, 3))
        v = m.init(jax.random.key(0), x, train=False)
        classes, boxes = m.apply(v, x, train=False)
        assert len(classes) == 5 and len(boxes) == 5
        assert classes[0].shape == (1, 16, 16, 9, 5)
        assert boxes[4].shape == (1, 1, 1, 9, 4)


class TestAttentionConvAndSkip:
    def test_attention_conv_shapes(self, rng):
        from tmv_tpu.models.layers.attention_conv import AttentionConv2D
        m = AttentionConv2D(filters=8, kernel_size=3)
        x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
        v = m.init(jax.random.key(0), x, train=False)
        y = m.apply(v, x, train=False)
        assert y.shape == (2, 8, 8, 8)

    def test_metrics_logger(self, tmp_path):
        from tmv_tpu.core.metrics import MetricsLogger, StepTimer
        log = tmp_path / "m.jsonl"
        ml = MetricsLogger(str(log))
        ml.log(1, {"loss": 0.5})
        ml.log(2, {"loss": jnp.asarray(0.25)})
        ml.close()
        lines = [json.loads(l) for l in log.read_text().splitlines()]
        assert lines[0]["loss"] == 0.5 and lines[1]["step"] == 2
        st = StepTimer(batch_size=4)
        st.tick()
        out = st.tick()
        assert "images_per_sec" in out
