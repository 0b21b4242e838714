"""ClassNet / BoxNet prediction heads.

Parity surface: `layers/class_net.py:6-103` and `layers/box_net.py:5-102` —
``repeats`` separable convs *shared across levels* with *per-level* BN
tables, swish, drop_connect + residual for i>0, and a final separable
predict conv (ClassNet bias init ``−log((1−0.01)/0.01)``; BoxNet zeros);
outputs reshaped to ``(B, h, w, A, C)`` / ``(B, h, w, A, 4)``.
"""

import math
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from tmv_tpu.models.efficientdet.bifpn import SeparableConv
from tmv_tpu.ops.regularizers import drop_connect


class _PredictionNet(nn.Module):
    """Shared structure of ClassNet and BoxNet."""

    out_per_anchor: int
    num_anchors: int
    num_filters: int
    num_levels: int
    repeats: int
    survival_prob: Optional[float]
    predict_bias_init: float
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence, train: bool = False, rngs_key=None):
        convs = [
            SeparableConv(self.num_filters, 3, use_bias=True,
                          dtype=self.dtype, name=f"conv_{i}")
            for i in range(self.repeats)
        ]
        predict = SeparableConv(
            self.out_per_anchor * self.num_anchors, 3, use_bias=True,
            dtype=self.dtype, name="predict",
            quantize=False,  # final logits stay float on the int8 path
        )
        outputs = []
        for level_id in range(self.num_levels):
            image = inputs[level_id]
            for i in range(self.repeats):
                original = image
                image = convs[i](image)
                image = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=self.bn_momentum, epsilon=self.bn_epsilon,
                    dtype=self.dtype, name=f"bn_{i}_level_{level_id}",
                )(image)
                image = nn.swish(image)
                if i > 0 and self.survival_prob:
                    if train:
                        key = self.make_rng("dropout")
                        image = drop_connect(image, key, True,
                                             self.survival_prob)
                    image = image + original
            out = predict(image)
            b, h, w, _ = out.shape
            # predict-conv bias initialization is folded in post-init (see
            # init_predict_bias below); flax param init handles kernels.
            outputs.append(
                out.reshape(b, h, w, self.num_anchors, self.out_per_anchor)
            )
        return tuple(outputs)


class ClassNet(nn.Module):
    num_classes: int = 90
    num_anchors: int = 9
    num_filters: int = 32
    num_levels: int = 5
    repeats: int = 4
    survival_prob: Optional[float] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        # prior-prob bias: -log((1-p)/p), p = 0.01 (class_net.py:74-78)
        net = _PredictionNet(
            out_per_anchor=self.num_classes,
            num_anchors=self.num_anchors,
            num_filters=self.num_filters,
            num_levels=self.num_levels,
            repeats=self.repeats,
            survival_prob=self.survival_prob,
            predict_bias_init=-math.log((1 - 0.01) / 0.01),
            dtype=self.dtype,
            name="net",
        )
        return net(inputs, train)


class BoxNet(nn.Module):
    num_anchors: int = 9
    num_filters: int = 32
    num_levels: int = 5
    repeats: int = 4
    survival_prob: Optional[float] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        net = _PredictionNet(
            out_per_anchor=4,
            num_anchors=self.num_anchors,
            num_filters=self.num_filters,
            num_levels=self.num_levels,
            repeats=self.repeats,
            survival_prob=self.survival_prob,
            predict_bias_init=0.0,
            dtype=self.dtype,
            name="net",
        )
        return net(inputs, train)


def init_class_prior_bias(params, prior: float = 0.01):
    """Set the ClassNet predict-conv bias to the focal-loss prior after
    ``model.init`` (flax initializers cannot express per-layer constant
    biases cleanly through SeparableConv)."""
    bias_value = -math.log((1 - prior) / prior)

    # path layout: …/class_net/net/predict/pointwise/bias
    def visit(tree, path=()):
        if isinstance(tree, dict):
            return {k: visit(v, path + (k,)) for k, v in tree.items()}
        joined = "/".join(path)
        if "class_net" in joined and joined.endswith("predict/pointwise/bias"):
            return jnp.full_like(tree, bias_value)
        return tree

    return visit(params)
