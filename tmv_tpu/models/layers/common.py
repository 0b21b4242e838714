"""Shared conv building blocks (flax.linen, NHWC).

Parity surface: the Darknet conv wrappers of
`AIServer/ai_api/ai_models/utils/tf_yolo_utils.py:272-333`
(``DarknetConv2D`` — he_uniform init, l2 5e-4 (applied in the loss via
``ops.losses.l2_regularization``), valid padding with a top-left zero pad
when stride 2 — and the ``…_BN_Leaky`` / ``…_BN_Mish`` composites).

BatchNorm matches Keras defaults (momentum 0.99, epsilon 1e-3) so that
converted reference checkpoints reproduce activations.  The compute dtype is
configurable (bfloat16 on TPU); BN statistics stay float32.
"""

from typing import Any, Callable, Optional, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from tmv_tpu.ops.activations import leaky_relu, mish, swish

Dtype = Any


def _pair(v: Union[int, Tuple[int, int]]) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


ACTIVATIONS: dict[str, Callable] = {
    "leaky": leaky_relu,
    "mish": mish,
    "swish": swish,
    "relu": nn.relu,
    "linear": lambda x: x,
}


class DarknetConv(nn.Module):
    """Conv2D with Darknet padding semantics (no BN, optional bias)."""

    filters: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    strides: Union[int, Tuple[int, int]] = 1
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        strides = _pair(self.strides)
        # Darknet downsampling: top-left zero pad + VALID
        # (ZeroPadding2D(((1,0),(1,0))) in yolo_v3/model.py:17)
        padding = ((1, 0), (1, 0)) if strides == (2, 2) else "SAME"
        return nn.Conv(
            self.filters,
            _pair(self.kernel_size),
            strides=strides,
            padding=padding,
            use_bias=self.use_bias,
            kernel_init=nn.initializers.he_uniform(),
            dtype=self.dtype,
        )(x)


class _ConvKernelHolder(nn.Module):
    """Declares ``Conv_0/kernel`` exactly as ``DarknetConv``'s nn.Conv
    would, so the int8 path keeps a byte-identical variable tree."""

    filters: int
    kernel_size: Tuple[int, int]
    in_features: int

    @nn.compact
    def __call__(self):
        class _Inner(nn.Module):
            filters: int
            kernel_size: Tuple[int, int]
            in_features: int

            @nn.compact
            def __call__(self):
                return self.param(
                    "kernel", nn.initializers.he_uniform(),
                    self.kernel_size + (self.in_features, self.filters))

        return _Inner(self.filters, self.kernel_size, self.in_features,
                      name="Conv_0")()


class _BNHolder(nn.Module):
    """Declares ``nn.BatchNorm``'s variables without running it."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones_init(),
                           (self.features,))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.features,), jnp.float32))
        var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.features,), jnp.float32))
        return scale, bias, mean.value, var.value


class ConvBN(nn.Module):
    """Conv → BatchNorm → activation (DarknetConv2D_BN_{Leaky,Mish} parity).

    Under ``with tmv_tpu.quant.quantized():`` (trace-time flag, eval only)
    the conv runs as a dynamic-int8 MXU op with the BN affine folded into
    the dequantization (`quant/dynamic.py`); variable tree is unchanged.
    ``quantized("calib")`` taps per-site input absmax into a
    ``quant_stats`` collection and ``quantized("int8_static")`` consumes
    the calibrated ``quant`` collection with pre-quantized weights
    (`quant/static.py`) — no runtime statistics passes.
    """

    filters: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    strides: Union[int, Tuple[int, int]] = 1
    act: str = "leaky"
    dtype: Dtype = jnp.float32
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x, train: bool = False):
        from tmv_tpu.quant.dynamic import dynamic_int8_conv, quant_mode

        mode = quant_mode()
        if mode in ("int8", "int8_static") and not train:
            strides = _pair(self.strides)
            kernel = _ConvKernelHolder(
                self.filters, _pair(self.kernel_size), x.shape[-1],
                name="DarknetConv_0")()
            scale, bias, mean, var = _BNHolder(
                self.filters, name="BatchNorm_0")()
            factor = scale / jnp.sqrt(var + self.bn_epsilon)
            offset = bias - mean * factor
            if strides == (2, 2):
                x = jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))
                padding = "VALID"
            else:
                padding = "SAME"
            if mode == "int8_static":
                from tmv_tpu.quant.static import static_int8_conv

                in_absmax = self.variable(
                    "quant", "in_absmax", lambda: jnp.ones(())).value
                kernel_q = self.variable(
                    "quant", "kernel_q",
                    lambda: jnp.zeros(kernel.shape, jnp.int8)).value
                w_absmax = self.variable(
                    "quant", "w_absmax",
                    lambda: jnp.ones((self.filters,))).value
                y = static_int8_conv(
                    x, kernel_q, in_absmax, w_absmax, strides, padding,
                    out_scale=factor, out_offset=offset)
            else:
                y = dynamic_int8_conv(x, kernel, strides, padding,
                                      out_scale=factor, out_offset=offset)
            return ACTIVATIONS[self.act](y.astype(self.dtype))

        if mode == "calib" and not train:
            # calibration: float forward + per-site input-absmax tap
            # (per-channel vector; per-tensor mode collapses it at
            # prepare time — see quant/static.py::sow_calib)
            self.sow("quant_stats", "in_absmax",
                     jnp.max(jnp.abs(x.astype(jnp.float32)),
                             axis=(0, 1, 2)),
                     init_fn=lambda: jnp.zeros(()),
                     reduce_fn=jnp.maximum)

        x = DarknetConv(
            self.filters, self.kernel_size, self.strides,
            use_bias=False, dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=self.bn_epsilon,
            dtype=self.dtype,
        )(x)
        return ACTIVATIONS[self.act](x)


def max_pool_same(x, window: int, strides: int = 1):
    """MaxPool2D with SAME padding (SPP pools, `yolo_v4/model.py:109-111`)."""
    return nn.max_pool(
        x, (window, window), strides=(strides, strides), padding="SAME"
    )


def upsample2x(x, method: str = "nearest"):
    """UpSampling2D(2) parity (nearest by default)."""
    b, h, w, c = x.shape
    if method == "nearest":
        return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    import jax

    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method=method)


def resize_bilinear(x, size: Tuple[int, int]):
    """tf.image.resize default (bilinear, half-pixel) parity."""
    import jax

    b, _, _, c = x.shape
    return jax.image.resize(x, (b, size[0], size[1], c), method="bilinear")
