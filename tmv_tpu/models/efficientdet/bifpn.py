"""BiFPN: resample layers, weighted-fusion nodes, hard-wired P3–P7 cell.

Parity surface:
- ``ResampleFeatureMap`` — `layers/resample_feature_map.py:5-52`: 1×1
  conv+BN iff channel mismatch, then 3×3 s2 SAME maxpool if taller than the
  target, nearest-resize if shorter.
- ``BiFPNNode`` — `layers/bifpn.py:31-74`: one trainable scalar per input
  (init 1, *no* relu — the reference's raw-weight fast-attention variant),
  fusion ``Σ wᵢ·resample(xᵢ) / (Σw + 1e-4)``, then swish → SepConv 3×3
  (bias) → BN (``OpAfterCombine``, bifpn.py:7-29).
- ``BiFPN`` — `layers/bifpn.py:77-118`: the fixed 8-node graph (4 top-down
  P6'..P3", 4 bottom-up P4"..P7").
- ``fpn_weight_method='sum'`` (D6/D7 configs) falls back to an unweighted
  sum, covering the capability the reference's dormant `layers/fpn.py`
  weight methods provide for the shipped configs.
"""

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class SeparableConv(nn.Module):
    """SeparableConv2D(depth_multiplier=1) parity: depthwise then 1×1."""

    filters: int
    kernel_size: int = 3
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        x = nn.Conv(in_f, (self.kernel_size, self.kernel_size), padding="SAME",
                    feature_group_count=in_f, use_bias=False,
                    kernel_init=nn.initializers.variance_scaling(
                        1.0, "fan_in", "truncated_normal"),
                    dtype=self.dtype, name="depthwise")(x)
        return nn.Conv(self.filters, (1, 1), padding="SAME",
                       use_bias=self.use_bias,
                       kernel_init=nn.initializers.variance_scaling(
                           1.0, "fan_in", "truncated_normal"),
                       dtype=self.dtype, name="pointwise")(x)


class ResampleFeatureMap(nn.Module):
    target_num_channels: int
    level_size: int
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = x.shape[1]
        if x.shape[-1] != self.target_num_channels:
            x = nn.Conv(self.target_num_channels, (1, 1), padding="SAME",
                        dtype=self.dtype, name="conv2d")(x)
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=self.bn_momentum,
                             epsilon=self.bn_epsilon, dtype=self.dtype,
                             name="bn")(x)
        if h > self.level_size:
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        elif h < self.level_size:
            b, _, w, c = x.shape
            x = jax.image.resize(
                x, (b, self.level_size, self.level_size, c), method="nearest"
            )
        return x


class OpAfterCombine(nn.Module):
    filters: int
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.swish(x)
        x = SeparableConv(self.filters, 3, use_bias=True, dtype=self.dtype)(x)
        return nn.BatchNorm(use_running_average=not train,
                            momentum=self.bn_momentum,
                            epsilon=self.bn_epsilon, dtype=self.dtype)(x)


class BiFPNNode(nn.Module):
    filters: int
    level_size: int
    num_inputs: int
    weight_method: str = "fastattn"
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence, train: bool = False):
        assert len(inputs) == self.num_inputs
        resampled = [
            ResampleFeatureMap(self.filters, self.level_size,
                               self.bn_momentum, self.bn_epsilon,
                               self.dtype)(x, train)
            for x in inputs
        ]
        if self.weight_method == "sum":
            fused = sum(resampled)
        else:  # raw-scalar fast attention (layers/bifpn.py:59-67)
            wsms = [
                self.param(f"WSM_{i}", nn.initializers.ones, ())
                for i in range(self.num_inputs)
            ]
            wsum = sum(wsms)
            fused = sum(
                r * w / (wsum + 1e-4) for r, w in zip(resampled, wsms)
            )
        return OpAfterCombine(self.filters, self.bn_momentum,
                              self.bn_epsilon, self.dtype)(fused, train)


class BiFPN(nn.Module):
    """One BiFPN cell over (P3..P7): 4 top-down + 4 bottom-up nodes."""

    filters: int
    levels_size: Sequence[int]  # sizes for levels min..max (5 entries)
    weight_method: str = "fastattn"
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence, train: bool = False):
        p3_0, p4_0, p5_0, p6_0, p7_0 = inputs
        ls = self.levels_size

        def node(size, n_in):
            return BiFPNNode(self.filters, size, n_in, self.weight_method,
                             self.bn_momentum, self.bn_epsilon, self.dtype)

        p6_1 = node(ls[3], 2)([p6_0, p7_0], train)
        p5_1 = node(ls[2], 2)([p5_0, p6_1], train)
        p4_1 = node(ls[1], 2)([p4_0, p5_1], train)
        p3_2 = node(ls[0], 2)([p3_0, p4_1], train)
        p4_2 = node(ls[1], 3)([p4_0, p4_1, p3_2], train)
        p5_2 = node(ls[2], 3)([p5_0, p5_1, p4_2], train)
        p6_2 = node(ls[3], 3)([p6_0, p6_1, p5_2], train)
        p7_2 = node(ls[4], 2)([p7_0, p6_2], train)
        return (p3_2, p4_2, p5_2, p6_2, p7_2)
