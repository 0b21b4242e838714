"""InceptionResNetV1 (FaceNet's default backbone), flax/NHWC.

Parity surface: `AIServer/ai_api/ai_models/backbones/inception_resnet_v1.py`
— FaceNet-style stem (`:6-52`), 5×A (`:55-106`), ReductionA(192,192,256,384),
10×B (`:109-149`), ReductionB (`:152-207`), 5×C (`:210-249`), adaptive avg
pool → dropout → dense head (`:273-305`).  Residual adds are *unscaled* and
followed by relu, as in the reference.
"""

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from tmv_tpu.models.backbones.inception_modules import (
    BasicConv2D,
    Conv2DLinear,
    ReductionA,
    max_pool_valid,
)


class StemV1(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BasicConv2D(32, 3, 2, "VALID", self.dtype)(x, train)
        x = BasicConv2D(32, 3, 1, "VALID", self.dtype)(x, train)
        x = BasicConv2D(64, 3, 1, "SAME", self.dtype)(x, train)
        x = max_pool_valid(x)
        x = BasicConv2D(80, 1, 1, "SAME", self.dtype)(x, train)
        x = BasicConv2D(192, 3, 1, "VALID", self.dtype)(x, train)
        x = BasicConv2D(256, 3, 2, "VALID", self.dtype)(x, train)
        return x


class InceptionResNetA(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = lambda f, k: BasicConv2D(f, k, 1, "SAME", self.dtype)
        b1 = c(32, 1)(x, train)
        b2 = c(32, 1)(x, train)
        b2 = c(32, 3)(b2, train)
        b3 = c(32, 1)(x, train)
        b3 = c(32, 3)(b3, train)
        b3 = c(32, 3)(b3, train)
        y = jnp.concatenate([b1, b2, b3], axis=-1)
        y = Conv2DLinear(256, 1, 1, "SAME", self.dtype)(y, train)
        return nn.relu(y + x)


class InceptionResNetB(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = lambda f, k: BasicConv2D(f, k, 1, "SAME", self.dtype)
        b1 = c(128, 1)(x, train)
        b2 = c(128, 1)(x, train)
        b2 = c(128, (1, 7))(b2, train)
        b2 = c(128, (7, 1))(b2, train)
        y = jnp.concatenate([b1, b2], axis=-1)
        y = Conv2DLinear(896, 1, 1, "SAME", self.dtype)(y, train)
        return nn.relu(y + x)


class ReductionBV1(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b1 = max_pool_valid(x)
        b2 = BasicConv2D(256, 1, 1, "SAME", self.dtype)(x, train)
        b2 = BasicConv2D(384, 3, 2, "VALID", self.dtype)(b2, train)
        b3 = BasicConv2D(256, 1, 1, "SAME", self.dtype)(x, train)
        b3 = BasicConv2D(256, 3, 2, "VALID", self.dtype)(b3, train)
        b4 = BasicConv2D(256, 1, 1, "SAME", self.dtype)(x, train)
        b4 = BasicConv2D(256, 3, 1, "SAME", self.dtype)(b4, train)
        b4 = BasicConv2D(256, 3, 2, "VALID", self.dtype)(b4, train)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class InceptionResNetC(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = lambda f, k: BasicConv2D(f, k, 1, "SAME", self.dtype)
        b1 = c(192, 1)(x, train)
        b2 = c(192, 1)(x, train)
        b2 = c(192, (1, 3))(b2, train)
        b2 = c(192, (3, 1))(b2, train)
        y = jnp.concatenate([b1, b2], axis=-1)
        y = Conv2DLinear(1792, 1, 1, "SAME", self.dtype)(y, train)
        return nn.relu(y + x)


class InceptionResNetV1(nn.Module):
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

        x = StemV1(self.dtype)(x, train)
        for i in range(5):
            x = R(InceptionResNetA)(
                self.dtype, name=f"InceptionResNetA_{i}")(x, train)
        x = ReductionA(192, 192, 256, 384, self.dtype)(x, train)
        for i in range(10):
            x = R(InceptionResNetB)(
                self.dtype, name=f"InceptionResNetB_{i}")(x, train)
        x = ReductionBV1(self.dtype)(x, train)
        for i in range(5):
            x = R(InceptionResNetC)(
                self.dtype, name=f"InceptionResNetC_{i}")(x, train)
        x = jnp.mean(x, axis=(1, 2))  # adaptive avg pool (1,1) + flatten
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return nn.Dense(self.classes, dtype=self.dtype)(x)
