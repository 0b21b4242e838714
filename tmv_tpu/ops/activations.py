"""Activation functions used across the zoo.

Parity surface: the reference's Mish layer
(`AIServer/ai_api/ai_models/utils/mish.py:3-16`: ``x * tanh(softplus(x))``),
LeakyReLU(0.1) from the Darknet conv blocks
(`utils/tf_yolo_utils.py:300`), and swish used by EfficientNet.  Pure
functions — on TPU these are VPU element-wise ops that XLA fuses into the
surrounding conv/matmul epilogues, so no Pallas kernel is needed here.
"""

import jax
import jax.numpy as jnp


def mish(x: jax.Array) -> jax.Array:
    """Mish: ``x * tanh(softplus(x))``, numerically stable for large |x|."""
    return x * jnp.tanh(jax.nn.softplus(x))


def swish(x: jax.Array) -> jax.Array:
    """Swish / SiLU: ``x * sigmoid(x)``."""
    return jax.nn.silu(x)


def leaky_relu(x: jax.Array, negative_slope: float = 0.1) -> jax.Array:
    """LeakyReLU with the Darknet default slope of 0.1."""
    return jax.nn.leaky_relu(x, negative_slope=negative_slope)
