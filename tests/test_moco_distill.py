"""MoCo + distillation end-to-end smoke tests (tiny shapes, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from tmv_tpu.core.train_state import TrainState
from tmv_tpu.models.moco import (
    MocoState, ResNetYoloV3, init_moco_state, make_moco_train_step,
    push_queue,
)

ANCHORS = np.array(
    [[[116, 90], [156, 198], [373, 326]],
     [[30, 61], [62, 45], [59, 119]],
     [[10, 13], [16, 30], [33, 23]]], np.float32)


def _tiny_detector(out_filters: int):
    """Minimal 3-scale detector head stand-in: the MoCo/distill step and
    labeler logic are model-agnostic (`make_moco_train_step` /
    `make_pseudo_label_fn` accept any flax model with YOLO-shaped heads),
    so smoke tests run on this instead of the full ResNet50V2 tower —
    the real `ResNetYoloV3` is exercised in the slow tier."""
    import flax.linen as nn

    class Tiny(nn.Module):
        out_filters: int

        @nn.compact
        def __call__(self, x, train: bool = False):
            h = nn.Conv(8, (3, 3), strides=(8, 8), padding="SAME")(x)
            h = nn.BatchNorm(use_running_average=not train,
                             momentum=0.99, epsilon=1e-3)(h)
            h = nn.relu(h)
            h3 = nn.Conv(self.out_filters, (1, 1))(h)              # /8
            h = nn.relu(nn.Conv(8, (3, 3), strides=(2, 2),
                                padding="SAME")(h))
            h2 = nn.Conv(self.out_filters, (1, 1))(h)              # /16
            h = nn.relu(nn.Conv(8, (3, 3), strides=(2, 2),
                                padding="SAME")(h))
            h1 = nn.Conv(self.out_filters, (1, 1))(h)              # /32
            return h1, h2, h3

    return Tiny(out_filters)


def _make_moco_setup(model, size):
    x = jnp.zeros((2, size, size, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    heads = model.apply(variables, x, train=False)
    feat_dim = sum(int(np.prod(h.shape[1:])) for h in heads)
    extra = init_moco_state(variables, queue_size=16, feature_dim=feat_dim,
                            rng=jax.random.key(1))
    tx = optax.sgd(1e-3, momentum=0.9)
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              tx, extra=extra)
    return model, state, tx, size


@pytest.fixture(scope="module")
def moco_setup():
    return _make_moco_setup(_tiny_detector(6), 32)


class TestPushQueue:
    def test_ring_buffer_wraps(self):
        queue = jnp.zeros((8, 4))
        items = jnp.ones((3, 4))
        q1, p1 = push_queue(queue, jnp.asarray(6), items * 2)
        q1 = np.asarray(q1)
        assert (q1[6] == 2).all() and (q1[7] == 2).all() and (q1[0] == 2).all()
        assert int(p1) == 1


class TestMocoTrainStep:
    def test_one_step(self, moco_setup):
        model, state, tx, size = moco_setup
        rng = np.random.default_rng(0)
        batch = {
            "query": jnp.asarray(
                rng.uniform(size=(2, size, size, 3)).astype(np.float32)),
            "key": jnp.asarray(
                rng.uniform(size=(2, size, size, 3)).astype(np.float32)),
        }
        step = jax.jit(make_moco_train_step(model, tx))
        new_state, metrics = step(state, batch, jax.random.key(0))
        assert np.isfinite(float(metrics["loss"]))
        assert int(new_state.extra.queue_ptr) == 2
        # queue rows written with l2-normalized key features
        row = np.asarray(new_state.extra.queue[0])
        assert np.linalg.norm(row) == pytest.approx(1.0, rel=1e-4)
        # params changed, key tower moved toward query params
        p_old = jax.tree_util.tree_leaves(state.params)[0]
        p_new = jax.tree_util.tree_leaves(new_state.params)[0]
        assert not np.allclose(np.asarray(p_old), np.asarray(p_new))


class TestDistillation:
    def test_pseudo_labels_feed_targets(self, moco_setup):
        from tmv_tpu.data.yolo_targets import make_yolo_targets
        from tmv_tpu.models.distill import make_pseudo_label_fn

        model, state, tx, size = moco_setup
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        # classes_num must match out_filters = 3*(5+C) → C = -3? use model
        # with out_filters 6 → treat as anchors=3, C=-3 invalid; rebuild
        model2 = _tiny_detector(3 * (5 + 2))
        v2 = model2.init(jax.random.key(0), jnp.zeros((1, size, size, 3)),
                         train=False)
        labeler = make_pseudo_label_fn(
            model2, ANCHORS, (size, size), classes_num=2, max_boxes=10)
        imgs = jnp.asarray(np.random.default_rng(0).uniform(
            size=(2, size, size, 3)).astype(np.float32))
        boxes, ids, valid = labeler(v2, imgs, jax.random.key(0))
        assert boxes.shape == (2, 10, 4)
        assert valid.shape == (2, 10)
        # pixel-space boxes; untrained exp(wh) can overflow the frame —
        # just require finiteness (the pipeline clips downstream)
        assert np.isfinite(np.asarray(boxes)).all()
        targets = jax.vmap(
            lambda b, c, v: make_yolo_targets(b, c, v, ANCHORS,
                                              (size, size), 2)
        )(boxes, ids.astype(jnp.int32), valid)
        assert targets[0].shape[1:] == (size // 32, size // 32, 3, 7)

    def test_promote_teacher_copies(self, moco_setup):
        from tmv_tpu.models.distill import promote_teacher

        model, state, tx, size = moco_setup
        out = promote_teacher(state, None)
        a = jax.tree_util.tree_leaves(state.params)[0]
        b = jax.tree_util.tree_leaves(out["params"])[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestGraftParams:
    def test_copy_match_skip_mismatch(self):
        from tmv_tpu.convert.graft import graft_params
        dst = {"backbone": {"Conv_0": {"kernel": np.zeros((3, 3, 4, 8))}},
               "head": {"Conv_0": {"kernel": np.zeros((1, 1, 8, 21)),
                                   "bias": np.zeros((21,))}}}
        src = {"backbone": {"Conv_0": {"kernel": np.ones((3, 3, 4, 8))}},
               "head": {"Conv_0": {"kernel": np.ones((1, 1, 8, 33)),
                                   "bias": np.ones((33,))}}}
        out, copied, skipped = graft_params(dst, src)
        np.testing.assert_array_equal(
            out["backbone"]["Conv_0"]["kernel"], 1.0)  # grafted
        np.testing.assert_array_equal(
            out["head"]["Conv_0"]["kernel"], 0.0)      # shape mismatch
        assert copied == [("backbone", "Conv_0", "kernel")]
        assert len(skipped) == 2

    def test_missing_in_src_kept(self):
        from tmv_tpu.convert.graft import graft_params
        dst = {"a": {"w": np.zeros((2,))}, "b": {"w": np.zeros((2,))}}
        src = {"a": {"w": np.ones((2,))}}
        out, copied, skipped = graft_params(dst, src)
        np.testing.assert_array_equal(out["a"]["w"], 1.0)
        np.testing.assert_array_equal(out["b"]["w"], 0.0)
        assert skipped == []


@pytest.mark.slow  # full ResNet50V2 tower, 2 fwd + bwd traces
class TestMocoRealModel:
    def test_one_step_resnet_tower(self):
        model, state, tx, size = _make_moco_setup(
            ResNetYoloV3(out_filters=6), 64)
        rng = np.random.default_rng(0)
        batch = {
            "query": jnp.asarray(
                rng.uniform(size=(2, size, size, 3)).astype(np.float32)),
            "key": jnp.asarray(
                rng.uniform(size=(2, size, size, 3)).astype(np.float32)),
        }
        step = jax.jit(make_moco_train_step(model, tx))
        new_state, metrics = step(state, batch, jax.random.key(0))
        assert np.isfinite(float(metrics["loss"]))
        assert int(new_state.extra.queue_ptr) == 2


@pytest.mark.slow  # full finetune CLI e2e (compile-heavy)
class TestMocoFinetuneCli:
    def test_finetune_grafts_and_trains(self, tmp_path, monkeypatch):
        """pretrain-export-finetune flow end to end on tiny shapes
        (train_object_detection.py parity; PARITY r1 marked this 🔶)."""
        import sys
        import jax.numpy as jnp
        import optax
        from PIL import Image

        from tmv_tpu.core.checkpoint import CheckpointManager
        from tmv_tpu.models.moco import ResNetYoloV3

        rng = np.random.default_rng(0)
        for i in range(4):
            Image.fromarray(rng.integers(0, 255, (80, 96, 3), dtype=np.uint8),
                            "RGB").save(tmp_path / f"im{i}.jpg")
        (tmp_path / "classes.txt").write_text("cat\ndog\n")
        (tmp_path / "labels.txt").write_text("\n".join(
            f"im{i}.jpg|cat,10,10,60,50|dog,40,30,90,70|" for i in range(4))
            + "\n")
        (tmp_path / "anchors.txt").write_text(
            "10,13, 16,30, 33,23, 30,61, 62,45, 59,119, "
            "116,90, 156,198, 373,326\n")

        # fake MoCo export: a key tower with a marker value in the backbone
        moco = ResNetYoloV3(out_filters=21)
        v = moco.init(jax.random.key(5), jnp.zeros((1, 64, 64, 3)),
                      train=False)
        export = tmp_path / "moco_k"
        CheckpointManager(str(export)).save(
            0, {"params": v["params"], "batch_stats": v["batch_stats"]},
            force=True)

        argv = ["train_moco", "--mode", "finetune",
                "--trainImagePath", str(tmp_path),
                "--trainData", str(tmp_path / "labels.txt"),
                "--classesFile", str(tmp_path / "classes.txt"),
                "--anchorsFile", str(tmp_path / "anchors.txt"),
                "--batchSize", "2", "--imageSize", "64",
                "--steps", "2", "--exportPath", str(export),
                "--modelPath", str(tmp_path / "det_w")]
        monkeypatch.setattr(sys, "argv", argv)
        from tmv_tpu.cli import train_moco

        train_moco.main()
        assert CheckpointManager(str(tmp_path / "det_w")).latest_step() == 2
