"""InceptionResNetV2 over the shared Inception modules (flax/NHWC).

Parity surface: `AIServer/ai_api/ai_models/backbones/inception_resnet_v2.py`
— V4 stem, 5×A (residual to 384), ReductionA(256,256,384,384), 10×B
(residual to 1152), ReductionB (`:146-203`), 5×C (residual to 2144), avg
pool → dropout → dense.  (The reference constructs ``Stem()`` without its
required weight_decay argument — a latent crash; here weight decay is
loss-side so the stem simply works.)
"""

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from tmv_tpu.models.backbones.inception_modules import (
    BasicConv2D,
    Conv2DLinear,
    InceptionStem,
    ReductionA,
    max_pool_valid,
)


class InceptionResNetA2(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = lambda f, k: BasicConv2D(f, k, 1, "SAME", self.dtype)
        b1 = c(32, 1)(x, train)
        b2 = c(32, 1)(x, train)
        b2 = c(32, 3)(b2, train)
        b3 = c(32, 1)(x, train)
        b3 = c(48, 3)(b3, train)
        b3 = c(64, 3)(b3, train)
        y = jnp.concatenate([b1, b2, b3], axis=-1)
        y = Conv2DLinear(384, 1, 1, "SAME", self.dtype)(y, train)
        return nn.relu(y + x)


class InceptionResNetB2(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = lambda f, k: BasicConv2D(f, k, 1, "SAME", self.dtype)
        b1 = c(192, 1)(x, train)
        b2 = c(128, 1)(x, train)
        b2 = c(160, (1, 7))(b2, train)
        b2 = c(192, (7, 1))(b2, train)
        y = jnp.concatenate([b1, b2], axis=-1)
        y = Conv2DLinear(1152, 1, 1, "SAME", self.dtype)(y, train)
        return nn.relu(y + x)


class ReductionBV2(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b1 = max_pool_valid(x)
        b2 = BasicConv2D(256, 1, 1, "SAME", self.dtype)(x, train)
        b2 = BasicConv2D(384, 3, 2, "VALID", self.dtype)(b2, train)
        b3 = BasicConv2D(256, 1, 1, "SAME", self.dtype)(x, train)
        b3 = BasicConv2D(288, 3, 2, "VALID", self.dtype)(b3, train)
        b4 = BasicConv2D(256, 1, 1, "SAME", self.dtype)(x, train)
        b4 = BasicConv2D(288, 3, 1, "SAME", self.dtype)(b4, train)
        b4 = BasicConv2D(320, 3, 2, "VALID", self.dtype)(b4, train)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class InceptionResNetC2(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = lambda f, k: BasicConv2D(f, k, 1, "SAME", self.dtype)
        b1 = c(192, 1)(x, train)
        b2 = c(192, 1)(x, train)
        b2 = c(224, (1, 3))(b2, train)
        b2 = c(256, (3, 1))(b2, train)
        y = jnp.concatenate([b1, b2], axis=-1)
        y = Conv2DLinear(2144, 1, 1, "SAME", self.dtype)(y, train)
        return nn.relu(y + x)


class InceptionResNetV2(nn.Module):
    classes: int
    dropout_rate: float = 0.2
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        # remat: block-level rematerialization — exact, same variable tree
        # (explicit names pin the direct autonames; see YoloV4.remat)
        def R(cls):
            return (nn.remat(cls, static_argnums=(2,))
                    if self.remat else cls)

        x = InceptionStem(self.dtype)(x, train)
        for i in range(5):
            x = R(InceptionResNetA2)(
                self.dtype, name=f"InceptionResNetA2_{i}")(x, train)
        x = ReductionA(256, 256, 384, 384, self.dtype)(x, train)
        for i in range(10):
            x = R(InceptionResNetB2)(
                self.dtype, name=f"InceptionResNetB2_{i}")(x, train)
        x = ReductionBV2(self.dtype)(x, train)
        for i in range(5):
            x = R(InceptionResNetC2)(
                self.dtype, name=f"InceptionResNetC2_{i}")(x, train)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return nn.Dense(self.classes, dtype=self.dtype)(x)
