"""AttentionConv2D: spatial + channel attention conv wrapper (flax).

Parity surface: `AIServer/ai_api/ai_models/layers/attention_conv.py:4-59` —
a conv-BN-swish transform gated by two additive-attention maps (softmax over
space and over channels), concatenated with the attention-complement of the
input, then the main conv.  Dormant in the reference (all call sites
commented out) but part of the component inventory.
"""

from typing import Any, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp


class AttentionConv2D(nn.Module):
    filters: int
    kernel_size: Union[int, Tuple[int, int]]
    strides: Tuple[int, int] = (1, 1)
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        conv1x1 = lambda name: nn.Conv(c, (1, 1), padding="SAME",
                                       dtype=self.dtype, name=name)
        o = nn.Conv(c, (1, 1), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        o = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=self.dtype, name="bn1")(o)
        o = nn.swish(o)
        # spatial attention: softmax over (h, w)
        o1 = jnp.tanh(conv1x1("W1_1")(x) + conv1x1("W1_2")(o))
        o1 = conv1x1("V1")(o1)
        o1 = jnp.exp(o1) / jnp.sum(jnp.exp(o1), axis=(1, 2), keepdims=True)
        # channel attention: softmax over channels
        o2 = jnp.tanh(conv1x1("W2_1")(x) + conv1x1("W2_2")(o))
        o2 = conv1x1("V2")(o2)
        o2 = jnp.exp(o2) / jnp.sum(jnp.exp(o2), axis=-1, keepdims=True)

        merged = jnp.concatenate(
            [o * o1 + o * o2, x * (1.0 - o1) + x * (1.0 - o2)], axis=-1
        )
        ks = (self.kernel_size, self.kernel_size) if isinstance(
            self.kernel_size, int) else tuple(self.kernel_size)
        return nn.Conv(self.filters, ks, strides=self.strides,
                       padding="SAME", use_bias=self.use_bias,
                       kernel_init=nn.initializers.he_normal(),
                       dtype=self.dtype, name="conv2")(merged)


class SkipLayer(nn.Module):
    """Run a sub-layer stack and merge with the input
    (`layers/skip.py:4-26`; default merge = channel concat)."""

    layers: Tuple
    merge: str = "concat"

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = x
        for layer in self.layers:
            y = layer(y, train)
        if self.merge == "concat":
            return jnp.concatenate([y, x], axis=-1)
        if self.merge == "add":
            return y + x
        raise ValueError(self.merge)
