"""Static-calibration int8 quantization for the serving path.

The round-2 dynamic-int8 verdict (PARITY §6) was a measured e2e loss
(0.84×/0.79× on YOLOv4): the model is bandwidth-bound (~16% MXU), and the
runtime per-conv absmax pass adds a full HBM read per layer that outweighs
the int8 MXU gain.  Static calibration removes every runtime statistics
pass and attacks the *bandwidth* bound instead of the MXU bound:

- activation scales are calibrated offline (one absmax per conv input,
  max-reduced over a calibration set) and stored in a ``quant`` variable
  collection — no runtime reduction;
- weights are pre-quantized host-side (per-output-channel absmax int8)
  into the same collection — no runtime weight pass;
- each conv then consumes ``quantize(x)`` where the quantize is a pure
  elementwise op that XLA fuses into the *producer's* epilogue
  (dequant → BN affine → mish/leaky → requantize is one fused elementwise
  chain), so inter-conv activations can materialize in HBM as int8 —
  halving the dominant traffic vs bf16.

Checkpoint compatibility: ``params``/``batch_stats`` trees are untouched;
calibration emits an *additional* ``quant`` collection mirroring the
ConvBN module paths.  Trace the model under ``quantized("int8_static")``
and pass the prepared variables.

No reference counterpart — a new TPU-native capability (the reference
serves float32 Keras models, `AIServer/ai_api/views/object_detection.py`).
"""

from typing import Any, Callable, Dict, Iterable

import jax
import jax.numpy as jnp
import numpy as np

QUANT_COLLECTION = "quant"
CALIB_COLLECTION = "quant_stats"


def calibrate_absmax(
    apply_fn: Callable[..., Any],
    variables: Dict,
    batches: Iterable,
) -> Dict:
    """Run ``apply_fn`` over ``batches`` in calibration mode and return the
    per-conv-input absmax tree (nested dict mirroring module paths, leaf
    key ``in_absmax``).

    ``apply_fn(variables, batch, mutable)`` must run the model forward in
    eval mode with ``mutable`` passed through to ``model.apply`` (see
    :func:`calibrate_model`).  The enclosing code must NOT already be
    inside a ``quantized()`` context.
    """
    from tmv_tpu.quant.dynamic import quantized

    acc = None
    with quantized("calib"):
        for batch in batches:
            _, aux = apply_fn(variables, batch, [CALIB_COLLECTION])
            stats = jax.tree.map(np.asarray, aux[CALIB_COLLECTION])
            acc = stats if acc is None else jax.tree.map(
                np.maximum, acc, stats)
    if acc is None:
        raise ValueError("calibration set is empty")
    return acc


def calibrate_model(model, variables: Dict, batches: Iterable,
                    **apply_kwargs) -> Dict:
    """Convenience wrapper: calibrate a flax model's ``__call__`` forward.

    ``batches`` yields image arrays; extra kwargs (e.g. ``train=False``)
    are forwarded to ``model.apply``.
    """

    def apply_fn(v, batch, mutable):
        return model.apply(v, batch, mutable=mutable, **apply_kwargs)

    return calibrate_absmax(apply_fn, variables, batches)


def _walk(tree: Dict, path=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _walk(v, path + (k,))
    else:
        yield path, tree


def _get(tree: Dict, path):
    for k in path:
        tree = tree[k]
    return tree


def _set(tree: Dict, path, value):
    for k in path[:-1]:
        tree = tree.setdefault(k, {})
    tree[path[-1]] = value


def prepare_static_int8_variables(variables: Dict, absmax_tree: Dict,
                                  margin: float = 1.0,
                                  per_channel: bool = False) -> Dict:
    """Bake calibrated scales + pre-quantized weights into a ``quant``
    collection alongside the existing variables.

    Args:
        variables: ``{"params": ..., "batch_stats": ...}`` float variables.
        absmax_tree: output of :func:`calibrate_absmax`.
        margin: multiplier on the calibrated absmax (headroom for inputs
            outside the calibration set; 1.0 = exact calibration max).
        per_channel: quantize activations with a per-input-channel scale
            instead of one per-tensor scale.  The channel scales are
            folded into the pre-quantized weights along the kernel's
            input axis, so the conv stays a pure int8×int8→int32 MXU op
            and the runtime quantize is still one fused elementwise
            multiply (by a broadcast vector instead of a scalar) — same
            HBM traffic, strictly finer activation resolution.  Robust
            to channel-skewed activation ranges (converged Mish nets).

    Returns a NEW variables dict with the ``quant`` collection added;
    ``params``/``batch_stats`` are shared, not copied.
    """
    params = variables["params"]
    quant: Dict = {}
    for path, absmax in _walk(absmax_tree):
        # sow leaf path: (<module>..., "in_absmax[_<ConvName>]"); with
        # reduce_fn the leaf is the array itself (no tuple wrapper on
        # newer flax, a 1-tuple on older — normalize).  The sow records
        # a per-input-channel absmax vector (scalar in pre-r4 trees).
        if isinstance(absmax, (tuple, list)):
            absmax = absmax[0]
        absmax = np.asarray(absmax, np.float32)
        site, leaf = path[:-1], path[-1]
        if leaf == "in_absmax":
            # single-conv module (ConvBN): kernel under its DarknetConv
            kernel_path = site + ("DarknetConv_0", "Conv_0", "kernel")
            suffix = ""
        else:
            # multi-conv module (MBConvBlock/Stem/SeparableConv): the sow
            # leaf carries the conv submodule name — kernel lives there
            conv_name = leaf[len("in_absmax_"):]
            kernel_path = site + (conv_name, "kernel")
            suffix = "_" + conv_name
        kernel = np.asarray(_get(params, kernel_path))
        if per_channel and absmax.ndim == 1:
            # fold the per-channel activation scale a_c into the kernel's
            # input axis (grouped-conv aware: kernel[..., i, o] consumes
            # input channel (o // (O//g))*I + i), then per-output quant
            a_vec = np.maximum(absmax * margin, 1e-6).astype(np.float32)
            h, w, i_dim, o_dim = kernel.shape
            groups = a_vec.size // i_dim
            if a_vec.size % i_dim or o_dim % max(groups, 1):
                raise ValueError(
                    f"kernel {kernel.shape} does not divide the "
                    f"{a_vec.size}-channel activation at {'/'.join(path)}")
            ch = ((np.arange(o_dim)[None, :] // (o_dim // groups)) * i_dim
                  + np.arange(i_dim)[:, None])              # (I, O)
            w_scaled = kernel * a_vec[ch][None, None]
            w_absmax = np.maximum(
                np.max(np.abs(w_scaled), axis=(0, 1, 2)), 1e-12
            ).astype(np.float32)
            kernel_q = np.clip(
                np.round(w_scaled * (127.0 / w_absmax)), -127, 127
            ).astype(np.int8)
            in_leaf = jnp.asarray(a_vec)
        else:
            w_absmax = np.maximum(
                np.max(np.abs(kernel), axis=(0, 1, 2)), 1e-12
            ).astype(np.float32)
            kernel_q = np.clip(
                np.round(kernel * (127.0 / w_absmax)), -127, 127
            ).astype(np.int8)
            in_leaf = jnp.float32(
                max(float(absmax.max()) * margin, 1e-6))
        _set(quant, site + ("in_absmax" + suffix,), in_leaf)
        _set(quant, site + ("kernel_q" + suffix,), jnp.asarray(kernel_q))
        _set(quant, site + ("w_absmax" + suffix,), jnp.asarray(w_absmax))
    out = dict(variables)
    out[QUANT_COLLECTION] = quant
    return out


def static_int8_conv(
    x,
    kernel_q,
    in_absmax,
    w_absmax,
    strides=(1, 1),
    padding="SAME",
    out_scale=None,
    out_offset=None,
    feature_group_count=1,
):
    """int8×int8→int32 convolution with *static* activation scale.

    The input quantize is a pure elementwise op (static scale — no
    data-dependent reduction), so XLA fuses it into the producing op's
    epilogue and the conv reads an int8 HBM buffer.

    ``in_absmax`` is either a scalar (per-tensor activation scale) or a
    per-input-channel vector; in the vector case the channel scales were
    already folded into ``kernel_q``/``w_absmax`` at prepare time
    (:func:`prepare_static_int8_variables` with ``per_channel=True``), so
    the dequant is per-output-channel only.
    """
    xq = jnp.clip(
        jnp.round(x.astype(jnp.float32) * (127.0 / in_absmax)),
        -127, 127).astype(jnp.int8)
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kernel_q.shape, ("NHWC", "HWIO", "NHWC"))
    acc = jax.lax.conv_general_dilated(
        xq, kernel_q, strides, padding, dimension_numbers=dn,
        feature_group_count=feature_group_count,
        preferred_element_type=jnp.int32)
    if jnp.ndim(in_absmax):
        deq = w_absmax.astype(jnp.float32) / (127.0 * 127.0)
    else:
        deq = (in_absmax / 127.0) * (w_absmax.astype(jnp.float32) / 127.0)
    if out_scale is not None:
        deq = deq * out_scale.astype(jnp.float32)
    y = acc.astype(jnp.float32) * deq
    if out_offset is not None:
        y = y + out_offset.astype(jnp.float32)
    return y


def calibrate_directory(model, variables: Dict, calib_dir: str, image_wh,
                        max_images: int = 32, margin: float = 1.0,
                        per_channel: bool = False) -> Dict:
    """Calibrate static-int8 scales over a directory of images
    (letterboxed exactly like serving inputs) and return the variables
    with the baked ``quant`` collection.  Shared by ``serve --int8Static``
    and ``export_model --int8Static``.  ``margin`` multiplies the
    calibrated absmax (<1 clips activation outliers — see
    ``--int8Margin``); ``per_channel`` selects per-input-channel
    activation scales (``--int8PerChannel``)."""
    import os

    from PIL import Image

    from tmv_tpu.utils import image_helper

    paths = sorted(
        os.path.join(calib_dir, f) for f in os.listdir(calib_dir)
        if f.lower().endswith((".jpg", ".jpeg", ".png", ".bmp")))
    if not paths:
        raise ValueError(f"no calibration images in {calib_dir}")
    batches = []
    for p in paths[:max_images]:
        img = np.asarray(Image.open(p).convert("RGB"), np.uint8)
        boxed, _, _ = image_helper.proportional_resize(
            img, np.int32(image_wh), bg_color=(0, 0, 0))
        batches.append(jnp.asarray(boxed.astype(np.float32)[None] / 255.0))
    return prepare_static_int8_variables(
        variables, calibrate_model(model, variables, batches, train=False),
        margin=margin, per_channel=per_channel)


# --------------------------------------------------------------- flax sites
# Canonical helpers for wiring static-int8 conv sites into flax modules
# with byte-identical param/batch_stats trees (used by the EfficientDet
# backbone, the BiFPN/head SeparableConvs, and available to new models).

def sow_calib(mdl, name: str, x) -> None:
    """Tap the per-site conv-input absmax during a ``quantized("calib")``
    forward (consumed by :func:`prepare_static_int8_variables`).  The sow
    leaf ``in_absmax_<name>`` max-reduces over repeated calls, so modules
    applied at several feature levels calibrate one shared scale.

    Records a per-input-channel vector (max over batch+space); the
    per-tensor mode collapses it with ``max()`` at prepare time, so the
    superset costs nothing and enables ``per_channel=True``."""
    mdl.sow("quant_stats", f"in_absmax_{name}",
            jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(0, 1, 2)),
            init_fn=lambda: jnp.zeros(()), reduce_fn=jnp.maximum)


def static_conv_site(mdl, name: str, x, kernel_shape, strides=(1, 1),
                     groups: int = 1, bn=None, bn_epsilon: float = 1e-3,
                     bias=None):
    """One conv site on the static-int8 path.

    Reads the calibrated ``quant`` collection (leaves suffixed by the conv
    submodule ``name``); optionally folds a following BN affine
    (``bn = (scale, bias, mean, var)``) into the dequant, or adds the
    conv's own ``bias``.  Returns pre-activation float32.
    """
    in_absmax = mdl.variable(
        "quant", f"in_absmax_{name}", lambda: jnp.ones(())).value
    kernel_q = mdl.variable(
        "quant", f"kernel_q_{name}",
        lambda: jnp.zeros(tuple(kernel_shape), jnp.int8)).value
    w_absmax = mdl.variable(
        "quant", f"w_absmax_{name}",
        lambda: jnp.ones((kernel_shape[-1],))).value
    out_scale = out_offset = None
    if bn is not None:
        scale, b_bias, mean, var = bn
        out_scale = scale / jnp.sqrt(var + bn_epsilon)
        out_offset = b_bias - mean * out_scale
    elif bias is not None:
        out_offset = bias
    return static_int8_conv(
        x, kernel_q, in_absmax, w_absmax, tuple(strides), "SAME",
        out_scale=out_scale, out_offset=out_offset,
        feature_group_count=groups)
