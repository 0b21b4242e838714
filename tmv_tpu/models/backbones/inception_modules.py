"""Shared Inception building blocks (flax, NHWC).

Parity surface: `AIServer/ai_api/ai_models/backbones/inception_modules.py`
— ``BasicConv2D`` (conv+BN+relu), ``Conv2DLinear`` (conv+BN), the
InceptionV4-style ``Stem``, ``InceptionBlockA/B/C``, ``ReductionA`` (k,l,m,n
parameterized) and the V4 ``ReductionB``.  The L2(weight_decay) kernel
regularizers become loss-side ``ops.losses.l2_regularization``.
"""

from typing import Any, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


class BasicConv2D(nn.Module):
    filters: int
    kernel_size: Union[int, Tuple[int, int]]
    strides: int = 1
    padding: str = "SAME"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.filters, _pair(self.kernel_size),
                    strides=_pair(self.strides),
                    padding=self.padding.upper(), dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=self.dtype)(x)
        return nn.relu(x)


class Conv2DLinear(nn.Module):
    filters: int
    kernel_size: Union[int, Tuple[int, int]]
    strides: int = 1
    padding: str = "SAME"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.filters, _pair(self.kernel_size),
                    strides=_pair(self.strides),
                    padding=self.padding.upper(), dtype=self.dtype)(x)
        return nn.BatchNorm(use_running_average=not train, momentum=0.99,
                            epsilon=1e-3, dtype=self.dtype)(x)


def max_pool_valid(x, window=3, strides=2):
    return nn.max_pool(x, (window, window), strides=(strides, strides),
                       padding="VALID")


def avg_pool_same(x, window=3, strides=1):
    return nn.avg_pool(x, (window, window), strides=(strides, strides),
                       padding="SAME")


class InceptionStem(nn.Module):
    """InceptionV4/IRv2 stem (`inception_modules.py:39-122`)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = lambda f, k, s=1, p="SAME": BasicConv2D(f, k, s, p, self.dtype)
        x = c(32, 3, 2, "VALID")(x, train)
        x = c(32, 3, 1, "VALID")(x, train)
        x = c(64, 3, 1, "SAME")(x, train)
        b1 = max_pool_valid(x)
        b2 = c(96, 3, 2, "VALID")(x, train)
        x = jnp.concatenate([b1, b2], axis=-1)
        b3 = c(64, 1)(x, train)
        b3 = BasicConv2D(96, 3, 1, "VALID", self.dtype)(b3, train)
        b4 = c(64, 1)(x, train)
        b4 = BasicConv2D(64, (7, 1), 1, "SAME", self.dtype)(b4, train)
        b4 = BasicConv2D(64, (1, 7), 1, "SAME", self.dtype)(b4, train)
        b4 = BasicConv2D(96, 3, 1, "VALID", self.dtype)(b4, train)
        x = jnp.concatenate([b3, b4], axis=-1)
        b5 = c(192, 3, 2, "VALID")(x, train)
        b6 = max_pool_valid(x)
        return jnp.concatenate([b5, b6], axis=-1)


class InceptionBlockA(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = lambda f, k: BasicConv2D(f, k, 1, "SAME", self.dtype)
        b1 = avg_pool_same(x)
        b1 = c(96, 1)(b1, train)
        b2 = c(96, 1)(x, train)
        b3 = c(64, 1)(x, train)
        b3 = c(96, 3)(b3, train)
        b4 = c(64, 1)(x, train)
        b4 = c(96, 3)(b4, train)
        b4 = c(96, 3)(b4, train)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class InceptionBlockB(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = lambda f, k: BasicConv2D(f, k, 1, "SAME", self.dtype)
        b1 = avg_pool_same(x)
        b1 = c(128, 1)(b1, train)
        b2 = c(384, 1)(x, train)
        b3 = c(192, 1)(x, train)
        b3 = c(224, (1, 7))(b3, train)
        b3 = c(256, (1, 7))(b3, train)
        b4 = c(192, 1)(x, train)
        b4 = c(192, (1, 7))(b4, train)
        b4 = c(224, (7, 1))(b4, train)
        b4 = c(224, (1, 7))(b4, train)
        b4 = c(256, (7, 1))(b4, train)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class InceptionBlockC(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = lambda f, k: BasicConv2D(f, k, 1, "SAME", self.dtype)
        b1 = avg_pool_same(x)
        b1 = c(256, 1)(b1, train)
        b2 = c(256, 1)(x, train)
        b3 = c(384, 1)(x, train)
        b3_1 = c(256, (1, 3))(b3, train)
        b3_2 = c(256, (3, 1))(b3, train)
        b4 = c(384, 1)(x, train)
        b4 = c(448, (1, 3))(b4, train)
        b4 = c(512, (3, 1))(b4, train)
        b4_1 = c(256, (3, 1))(b4, train)
        b4_2 = c(256, (1, 3))(b4, train)
        return jnp.concatenate([b1, b2, b3_1, b3_2, b4_1, b4_2], axis=-1)


class ReductionA(nn.Module):
    k: int
    l: int
    m: int
    n: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b1 = max_pool_valid(x)
        b2 = BasicConv2D(self.n, 3, 2, "VALID", self.dtype)(x, train)
        b3 = BasicConv2D(self.k, 1, 1, "SAME", self.dtype)(x, train)
        b3 = BasicConv2D(self.l, 3, 1, "SAME", self.dtype)(b3, train)
        b3 = BasicConv2D(self.m, 3, 2, "VALID", self.dtype)(b3, train)
        return jnp.concatenate([b1, b2, b3], axis=-1)


class ReductionBV4(nn.Module):
    """InceptionV4 ReductionB (`inception_modules.py:305-360`)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b1 = max_pool_valid(x)
        b2 = BasicConv2D(192, 1, 1, "SAME", self.dtype)(x, train)
        b2 = BasicConv2D(192, 3, 2, "VALID", self.dtype)(b2, train)
        b3 = BasicConv2D(256, 1, 1, "SAME", self.dtype)(x, train)
        b3 = BasicConv2D(256, (1, 7), 1, "SAME", self.dtype)(b3, train)
        b3 = BasicConv2D(320, (7, 1), 1, "SAME", self.dtype)(b3, train)
        b3 = BasicConv2D(320, 3, 2, "VALID", self.dtype)(b3, train)
        return jnp.concatenate([b1, b2, b3], axis=-1)
