"""Forward-shape tests for the FaceNet backbones and ResNet50V2 taps."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.mark.slow  # three deep-backbone compiles; shape smoke only
class TestInceptionBackbones:
    def test_inception_resnet_v1_embedding(self):
        from tmv_tpu.models.backbones import InceptionResNetV1
        m = InceptionResNetV1(classes=128)
        x = jnp.zeros((1, 160, 160, 3))
        v = m.init({"params": jax.random.key(0),
                    "dropout": jax.random.key(1)}, x, train=False)
        y = m.apply(v, x, train=False)
        assert y.shape == (1, 128)

    def test_inception_resnet_v2_embedding(self):
        from tmv_tpu.models.backbones import InceptionResNetV2
        m = InceptionResNetV2(classes=64)
        x = jnp.zeros((1, 160, 160, 3))
        v = m.init({"params": jax.random.key(0),
                    "dropout": jax.random.key(1)}, x, train=False)
        y = m.apply(v, x, train=False)
        assert y.shape == (1, 64)

    def test_inception_v4_embedding(self):
        from tmv_tpu.models.backbones import InceptionV4
        m = InceptionV4(classes=64)
        x = jnp.zeros((1, 160, 160, 3))
        v = m.init({"params": jax.random.key(0),
                    "dropout": jax.random.key(1)}, x, train=False)
        y = m.apply(v, x, train=False)
        assert y.shape == (1, 64)


class TestResNet50V2:
    def test_tap_strides(self):
        from tmv_tpu.models.backbones.resnet_v2 import ResNet50V2
        m = ResNet50V2()
        x = jnp.zeros((1, 128, 128, 3))
        v = m.init(jax.random.key(0), x, train=False)
        y1, y2, y3 = m.apply(v, x, train=False)
        # strides 32/16/8, keras channel counts 2048/1024/512
        assert y1.shape == (1, 4, 4, 2048)
        assert y2.shape == (1, 8, 8, 1024)
        assert y3.shape == (1, 16, 16, 512)


class TestFaceNetModel:
    def test_l2_normalized_embeddings(self):
        from tmv_tpu.models.facenet import FaceNetModel
        m = FaceNetModel(embedding_size=32, backbone="RepVGG")
        x = jnp.asarray(np.random.default_rng(0).uniform(
            size=(2, 64, 64, 3)).astype(np.float32))
        v = m.init({"params": jax.random.key(0),
                    "dropout": jax.random.key(1)}, x, train=False)
        y = np.asarray(m.apply(v, x, train=False))
        assert y.shape == (2, 32)
        np.testing.assert_allclose(np.linalg.norm(y, axis=1), 1.0, rtol=1e-4)
