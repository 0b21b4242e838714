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


_sep_init = nn.initializers.variance_scaling(1.0, "fan_in",
                                             "truncated_normal")


class _SepConvParams(nn.Module):
    """Param-holder with ``nn.Conv``'s variable layout, so the static-int8
    path keeps byte-identical checkpoints (`quant/static.py`)."""

    shape: Any
    use_bias: bool = False

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", _sep_init, tuple(self.shape))
        bias = (self.param("bias", nn.initializers.zeros_init(),
                           (self.shape[-1],))
                if self.use_bias else None)
        return kernel, bias


class SeparableConv(nn.Module):
    """SeparableConv2D(depth_multiplier=1) parity: depthwise then 1×1.

    On the static-int8 serving path (``quantized("int8_static")``, see
    `quant/static.py`) both convs run int8 with calibrated scales; set
    ``quantize=False`` to pin a site to float (e.g. the head ``predict``
    logits).  The quant context is only entered on eval traces.
    """

    filters: int
    kernel_size: int = 3
    use_bias: bool = True
    dtype: Any = jnp.float32
    quantize: bool = True

    @nn.compact
    def __call__(self, x):
        from tmv_tpu.quant.dynamic import quant_mode
        from tmv_tpu.quant.static import sow_calib, static_conv_site

        mode = quant_mode()
        in_f = x.shape[-1]
        ks = self.kernel_size
        if mode == "int8_static" and self.quantize:
            dw_shape = (ks, ks, 1, in_f)
            _SepConvParams(dw_shape, name="depthwise")()
            x = static_conv_site(self, "depthwise", x, dw_shape,
                                 groups=in_f)
            pw_shape = (1, 1, in_f, self.filters)
            _, bias = _SepConvParams(pw_shape, use_bias=self.use_bias,
                                     name="pointwise")()
            x = static_conv_site(self, "pointwise", x, pw_shape, bias=bias)
            return x.astype(self.dtype)
        calib = mode == "calib" and self.quantize
        if calib:
            sow_calib(self, "depthwise", x)
        x = nn.Conv(in_f, (ks, ks), padding="SAME",
                    feature_group_count=in_f, use_bias=False,
                    kernel_init=_sep_init,
                    dtype=self.dtype, name="depthwise")(x)
        if calib:
            sow_calib(self, "pointwise", x)
        return nn.Conv(self.filters, (1, 1), padding="SAME",
                       use_bias=self.use_bias,
                       kernel_init=_sep_init,
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
        elif self.weight_method == "attn":
            # softmax over per-input scalars (layers/fpn.py:93-100)
            wsms = jnp.stack([
                self.param(f"WSM_{i}", nn.initializers.ones, ())
                for i in range(self.num_inputs)
            ])
            norm = jax.nn.softmax(wsms.astype(self.dtype))
            fused = sum(r * norm[i] for i, r in enumerate(resampled))
        elif self.weight_method == "channel_attn":
            # per-channel softmax weights (layers/fpn.py:112-119)
            wsms = jnp.stack([
                self.param(f"WSM_{i}", nn.initializers.ones,
                           (self.filters,))
                for i in range(self.num_inputs)
            ], axis=-1)  # (C, n_in)
            norm = jax.nn.softmax(wsms.astype(self.dtype), axis=-1)
            fused = sum(r * norm[:, i] for i, r in enumerate(resampled))
        elif self.weight_method == "channel_fastattn":
            # per-channel relu-free fast attention (layers/fpn.py:120-131;
            # the reference keeps raw weights, as with scalar fastattn)
            wsms = [
                self.param(f"WSM_{i}", nn.initializers.ones,
                           (self.filters,)).astype(self.dtype)
                for i in range(self.num_inputs)
            ]
            wsum = sum(wsms)
            fused = sum(
                r * w / (wsum + 1e-4) for r, w in zip(resampled, wsms)
            )
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
    """One BiFPN cell: top-down then bottom-up weighted-fusion nodes.

    Generalizes the reference's hard-wired P3–P7 8-node graph
    (`layers/bifpn.py:77-118`) to any level count — for n=5 the node
    wiring and parameter order match the reference exactly; n=6 covers the
    D7x config (max_level 8), which would crash the reference's unpack.
    """

    filters: int
    levels_size: Sequence[int]  # sizes for levels min..max
    weight_method: str = "fastattn"
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence, train: bool = False):
        n = len(inputs)
        assert n == len(self.levels_size) and n >= 3
        ls = self.levels_size

        def node(size, n_in):
            return BiFPNNode(self.filters, size, n_in, self.weight_method,
                             self.bn_momentum, self.bn_epsilon, self.dtype)

        # top-down: td[i] for i = n-2 … 1
        td = {}
        prev = inputs[n - 1]
        for i in range(n - 2, 0, -1):
            td[i] = node(ls[i], 2)([inputs[i], prev], train)
            prev = td[i]
        # bottom-up outputs
        outs = [node(ls[0], 2)([inputs[0], td[1]], train)]
        for i in range(1, n - 1):
            outs.append(
                node(ls[i], 3)([inputs[i], td[i], outs[-1]], train))
        outs.append(node(ls[n - 1], 2)([inputs[n - 1], outs[-1]], train))
        return tuple(outs)
