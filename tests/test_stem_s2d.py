"""Space-to-depth stem: exact-equivalence transform of the reference stem
(`layers/stem.py:6-38`) for TPU lane utilization — the math, the variable
tree, and the full-model outputs must all be preserved."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax import lax

from tmv_tpu.models.efficientdet import (
    EfficientDetNet, get_efficientdet_config,
)
from tmv_tpu.ops.space_to_depth import space_to_depth, stem_kernel_to_s2d


class TestSpaceToDepthStem:
    @pytest.mark.parametrize("hw,cin,cout", [(64, 3, 32), (40, 5, 48)])
    def test_conv_equivalence(self, hw, cin, cout):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, hw, hw, cin)).astype(np.float32))
        w3 = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32))
        ref = lax.conv_general_dilated(
            x, w3, (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = lax.conv_general_dilated(
            space_to_depth(x, 2), stem_kernel_to_s2d(w3), (1, 1),
            [(0, 1), (0, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   rtol=1e-5, atol=1e-5)

    def test_d0_model_equivalence_and_variable_tree(self):
        """stem_s2d=True applies a baseline-initialised checkpoint unchanged
        and produces the same outputs — so converted reference weights keep
        reproducing activations (CLAUDE.md convention)."""
        cfg = get_efficientdet_config("efficientdet-d0")
        cfg.image_size = 64
        cfg.num_classes = 4
        cfg.levels_size = [64]
        for _ in range(cfg.max_level):
            cfg.levels_size.append((cfg.levels_size[-1] + 1) // 2)
        base = EfficientDetNet(config=cfg)
        from tmv_tpu.core.config import Config
        cfg2 = Config(cfg.as_dict())
        cfg2.stem_s2d = True
        s2d = EfficientDetNet(config=cfg2)

        x = jnp.asarray(np.random.default_rng(1).uniform(
            size=(2, 64, 64, 3)).astype(np.float32))
        variables = base.init(jax.random.key(0), x, train=False)
        v2 = s2d.init(jax.random.key(0), x, train=False)
        assert jax.tree_util.tree_structure(variables) == \
            jax.tree_util.tree_structure(v2)
        for (p, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(variables),
                jax.tree_util.tree_leaves_with_path(v2)):
            assert a.shape == b.shape, p

        boxes_a, classes_a = base.apply(variables, x, train=False)
        boxes_b, classes_b = s2d.apply(variables, x, train=False)
        for a, b in zip(list(boxes_a) + list(classes_a),
                        list(boxes_b) + list(classes_b)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)

    def test_train_mode_gradients_match(self):
        """The transform is differentiable and stem grads (kernel + input)
        match the baseline in train mode — stem_s2d is usable for training,
        not just eval.  (Tested on the Stem module itself: pushing an
        unscaled L2 through the whole untrained D0 with train-mode BN is a
        chaotic amplifier and tells us nothing about the transform.)"""
        from tmv_tpu.models.efficientdet.backbone import Stem

        base = Stem(32, 1.0, 8)
        s2d = Stem(32, 1.0, 8, stem_s2d=True)
        x = jnp.asarray(np.random.default_rng(2).normal(
            size=(2, 32, 32, 3)).astype(np.float32))
        variables = base.init(jax.random.key(0), x, train=True)

        def loss(model, params, a):
            y, _ = model.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                a, train=True, mutable=["batch_stats"])
            return jnp.sum(jnp.square(y))

        for model_a, model_b in [(base, s2d)]:
            g_a = jax.grad(loss, argnums=(1, 2))(model_a,
                                                 variables["params"], x)
            g_b = jax.grad(loss, argnums=(1, 2))(model_b,
                                                 variables["params"], x)
            kern_a, kern_b = (g["Conv_0"]["kernel"] for g in (g_a[0], g_b[0]))
            np.testing.assert_allclose(np.asarray(kern_a),
                                       np.asarray(kern_b),
                                       rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(np.asarray(g_a[1]),
                                       np.asarray(g_b[1]),
                                       rtol=1e-4, atol=1e-4)
