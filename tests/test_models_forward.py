"""Forward-shape smoke tests for the model zoo (tiny inputs, CPU).

Modeled on the reference's script-style smoke tests in
`ai_models/tests/` (construct with the real config, run a forward pass,
check shapes)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.fixture(scope="module")
def rngkey():
    return jax.random.key(0)


class TestUNet:
    def test_forward_shapes(self, rngkey):
        from tmv_tpu.models.unet import UNet
        m = UNet(depth=2, filters_base=4, output_filters=3)
        x = jnp.zeros((1, 64, 64, 3))
        variables = m.init(rngkey, x, train=False)
        y = m.apply(variables, x, train=False)
        assert y.shape == (1, 64, 64, 3)
        assert (np.asarray(y) >= 0).all() and (np.asarray(y) <= 1).all()

    def test_train_updates_bn(self, rngkey):
        from tmv_tpu.models.unet import UNetLogits
        m = UNetLogits(depth=2, filters_base=4, output_filters=1)
        x = jnp.ones((2, 32, 32, 3))
        variables = m.init(rngkey, x, train=False)
        y, mutated = m.apply(variables, x, train=True,
                             mutable=["batch_stats"])
        assert y.shape == (2, 32, 32, 1)
        # running stats changed
        old = jax.tree_util.tree_leaves(variables["batch_stats"])
        new = jax.tree_util.tree_leaves(mutated["batch_stats"])
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(old, new)
        )


class TestYoloV3:
    def test_head_shapes(self, rngkey):
        from tmv_tpu.models.yolo_v3 import YoloV3
        m = YoloV3(classes_num=4)
        x = jnp.zeros((1, 128, 128, 3))
        variables = m.init(rngkey, x, train=False)
        h1, h2, h3 = m.apply(variables, x, train=False)
        assert h1.shape == (1, 4, 4, 27)
        assert h2.shape == (1, 8, 8, 27)
        assert h3.shape == (1, 16, 16, 27)


class TestYoloV4:
    def test_head_shapes(self, rngkey):
        from tmv_tpu.models.yolo_v4 import YoloV4
        m = YoloV4(classes_num=4)
        x = jnp.zeros((1, 128, 128, 3))
        variables = m.init(rngkey, x, train=False)
        z1, z2, z3 = m.apply(variables, x, train=False)
        assert z1.shape == (1, 4, 4, 27)
        assert z2.shape == (1, 8, 8, 27)
        assert z3.shape == (1, 16, 16, 27)


@pytest.mark.slow  # D0 compile; wiring is covered by the forward oracle
class TestEfficientDet:
    def test_forward_shapes_d0_small(self, rngkey):
        from tmv_tpu.models.efficientdet import (
            EfficientDetNet, get_efficientdet_config,
        )
        cfg = get_efficientdet_config("efficientdet-d0")
        cfg.image_size = 128
        cfg.levels_size = [128]
        for _ in range(cfg.max_level):
            cfg.levels_size.append((cfg.levels_size[-1] + 1) // 2)
        m = EfficientDetNet(config=cfg)
        x = jnp.zeros((1, 128, 128, 3))
        variables = m.init(rngkey, x, train=False)
        boxes, classes = m.apply(variables, x, train=False)
        assert len(boxes) == 5 and len(classes) == 5
        # levels 3..7 at 128px: 16, 8, 4, 2, 1
        assert boxes[0].shape == (1, 16, 16, 9, 4)
        assert classes[0].shape == (1, 16, 16, 9, 81)
        assert boxes[4].shape == (1, 1, 1, 9, 4)

    def test_backbone_endpoint_strides(self, rngkey):
        from tmv_tpu.models.efficientdet.backbone import BackboneModel
        from tmv_tpu.models.efficientdet.config import default_blocks_args
        m = BackboneModel(blocks_args=tuple(default_blocks_args()))
        x = jnp.zeros((1, 64, 64, 3))
        variables = m.init(rngkey, x, train=False)
        feats = m.apply(variables, x, train=False)
        # [final, r1..r5]; strides 2,4,8,16,32
        assert len(feats) == 6
        assert feats[1].shape[1] == 32
        assert feats[2].shape[1] == 16
        assert feats[3].shape[1] == 8
        assert feats[4].shape[1] == 4
        assert feats[5].shape[1] == 2
        assert feats[5].shape[-1] == 320  # b0 final block filters

    def test_six_level_bifpn_d7x_style(self, rngkey):
        # max_level 8 (D7x config) → 6 feature levels; the reference's
        # hard-wired 5-level BiFPN would crash here
        from tmv_tpu.models.efficientdet import (
            EfficientDetNet, get_efficientdet_config,
        )
        cfg = get_efficientdet_config("efficientdet-d0")
        cfg.override({"max_level": 8}, allow_new_keys=False)
        cfg.image_size = 128
        cfg.levels_size = [128]
        for _ in range(cfg.max_level):
            cfg.levels_size.append((cfg.levels_size[-1] + 1) // 2)
        m = EfficientDetNet(config=cfg)
        x = jnp.zeros((1, 128, 128, 3))
        variables = m.init(rngkey, x, train=False)
        boxes, classes = m.apply(variables, x, train=False)
        assert len(boxes) == 6
        assert boxes[5].shape == (1, 1, 1, 9, 4)

    def test_class_prior_bias(self, rngkey):
        from tmv_tpu.models.efficientdet import (
            EfficientDetNet, get_efficientdet_config,
        )
        from tmv_tpu.models.efficientdet.heads import init_class_prior_bias
        import math
        cfg = get_efficientdet_config("efficientdet-d0")
        cfg.image_size = 64
        cfg.levels_size = [64]
        for _ in range(cfg.max_level):
            cfg.levels_size.append((cfg.levels_size[-1] + 1) // 2)
        m = EfficientDetNet(config=cfg)
        variables = m.init(rngkey, jnp.zeros((1, 64, 64, 3)), train=False)
        params = init_class_prior_bias(variables["params"])
        bias = params["class_net"]["net"]["predict"]["pointwise"]["bias"]
        want = -math.log((1 - 0.01) / 0.01)
        np.testing.assert_allclose(np.asarray(bias), want, rtol=1e-6)
