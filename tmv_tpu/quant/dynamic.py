"""Dynamic int8 quantization for the serving path.

v5e's MXU runs int8 at ~2× the bf16 rate and XLA lowers int8
``conv_general_dilated`` (int32 accumulation) onto it natively — measured
335–495 TOP/s vs ~184 TFLOP/s bf16 on this chip (`tools/probe_int8_conv.py`).
For MXU-bound models (YOLOv4's 3×3 conv stacks) that halves inference conv
time.

Scheme: symmetric dynamic quantization, no calibration pass —
- weights: per-output-channel absmax int8 (folded with the BN affine),
- activations: per-tensor absmax int8, scale computed at runtime from the
  live tensor (one fused reduction),
- accumulation: int32; dequant + BN offset + activation in float.

This is a *serving mode*: training and the default predict path stay in
bf16/f32.  Enable by tracing the model under ``with quantized():``; the
conv wrappers (`models/layers/common.py::ConvBN`) check ``quant_mode()``
at trace time.  No reference counterpart — a new TPU-native capability.
"""

import threading
from contextlib import contextmanager
from typing import Tuple

import jax
import jax.numpy as jnp

_STATE = threading.local()


def quant_mode() -> str:
    """Trace-time quantization mode: "off" (default) or "int8"."""
    return getattr(_STATE, "mode", "off")


@contextmanager
def quantized(mode: str = "int8"):
    """Trace the enclosed model application with quantized conv wrappers.

    The mode is captured at *trace* time: wrap the ``model.apply`` call
    (or the first call of a jitted function) — already-compiled functions
    are unaffected.
    """
    prev = quant_mode()
    _STATE.mode = mode
    try:
        yield
    finally:
        _STATE.mode = prev


def dynamic_int8_conv(
    x,
    kernel,
    strides: Tuple[int, int] = (1, 1),
    padding="SAME",
    out_scale=None,
    out_offset=None,
):
    """int8×int8→int32 convolution with dynamic activation quantization.

    Args:
        x: (B, H, W, Cin) float activations.
        kernel: (kh, kw, Cin, Cout) float weights.
        out_scale: optional (Cout,) multiplier folded into the dequant
            (e.g. the BN ``gamma/sqrt(var+eps)``).
        out_offset: optional (Cout,) additive term applied after dequant
            (e.g. the BN ``beta − mean·scale``).

    Returns float32 output (caller casts/activates).
    """
    xf = x.astype(jnp.float32)
    kf = kernel.astype(jnp.float32)

    a_max = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-6)
    xq = jnp.clip(jnp.round(xf * (127.0 / a_max)), -127, 127
                  ).astype(jnp.int8)

    w_max = jnp.maximum(jnp.max(jnp.abs(kf), axis=(0, 1, 2)), 1e-12)
    wq = jnp.clip(jnp.round(kf * (127.0 / w_max)), -127, 127
                  ).astype(jnp.int8)

    dn = jax.lax.conv_dimension_numbers(
        x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
    acc = jax.lax.conv_general_dilated(
        xq, wq, strides, padding, dimension_numbers=dn,
        preferred_element_type=jnp.int32)

    deq = (a_max / 127.0) * (w_max / 127.0)
    if out_scale is not None:
        deq = deq * out_scale.astype(jnp.float32)
    y = acc.astype(jnp.float32) * deq
    if out_offset is not None:
        y = y + out_offset.astype(jnp.float32)
    return y
