"""Darknet ``.weights`` importer for the YOLO models.

Capability parity with `AIServer/ai_api/ai_models/yolo_v3/convert.py` +
`convert_tf2.py` (and the yolo_v4 twins): load the original Darknet binary
weight release into the framework's parameter pytree so mAP parity does not
require retraining.

Format (public Darknet convention): header of 5 int32 (major, minor,
revision, seen lo/hi — 4 int32 + int64 seen for version >= 2), then for each
convolutional layer in *config order*: either ``bias`` (conv with bias) or
``bn_beta, bn_gamma, bn_mean, bn_var`` (batch-normalized conv), followed by
conv weights in ``(out, in, h, w)`` order.

The flax models here call their convs in exactly the Darknet config order,
but **the params dict cannot be trusted to preserve that order** (flax/JAX
rebuild dicts with sorted keys, so ``ConvBN_10`` walks before ``ConvBN_2``).
The importer therefore derives the stream order by *tracing* the model —
``conv_call_order`` records each ``nn.Conv`` / ``nn.BatchNorm`` path during
an abstract ``model.init`` (``jax.eval_shape``, no FLOPs) — and pairs each
conv kernel with the BN that immediately follows it in call order (or with
its own bias).  ``save_darknet_weights`` is the inverse so the mapping is
round-trip-testable without shipping the original weight files.
"""

import struct
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

Path = Tuple[str, ...]


def conv_call_order(model, input_size, train: bool = False,
                    channels: int = 3) -> List[Tuple[str, Path]]:
    """Trace ``model.init`` and record conv/BN module paths in call order.

    This is the ground truth for the Darknet weight-stream order: the order
    convs execute, not the (sorted) order params dicts iterate.  Uses
    ``jax.eval_shape`` so no real compute happens.

    Args:
        model: a flax module whose ``__call__(x, train=...)`` builds the net.
        input_size: int or (h, w) of the dummy input.
        channels: input channels.

    Returns:
        list of ("conv" | "bn", path-tuple) in execution order.
    """
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    if isinstance(input_size, int):
        input_size = (input_size, input_size)
    order: List[Tuple[str, Path]] = []

    def interceptor(next_fn, args, kwargs, context):
        if (context.method_name == "__call__"
                and isinstance(context.module, (nn.Conv, nn.BatchNorm))):
            kind = "conv" if isinstance(context.module, nn.Conv) else "bn"
            path = tuple(context.module.path)
            if not order or order[-1][1] != path:
                order.append((kind, path))
        return next_fn(*args, **kwargs)

    x = jnp.zeros((1, input_size[0], input_size[1], channels), jnp.float32)
    with nn.intercept_methods(interceptor):
        try:
            jax.eval_shape(lambda k: model.init(k, x, train=train),
                           jax.random.key(0))
        except TypeError:
            jax.eval_shape(lambda k: model.init(k, x), jax.random.key(0))
    return order


def _layer_specs(params: Dict, order: Sequence[Tuple[str, Path]]
                 ) -> List[Dict]:
    """Pair each traced conv with its following BN (or its own bias)."""
    specs: List[Dict] = []
    for kind, path in order:
        if kind == "conv":
            node = _get(params, path)
            entry: Dict[str, Any] = {"kernel": path + ("kernel",)}
            if "bias" in node:
                entry["bias"] = path + ("bias",)
            specs.append(entry)
        else:  # bn — belongs to the conv that just executed
            if not specs or "bn" in specs[-1]:
                raise ValueError(
                    f"BatchNorm at {path} does not follow a conv — "
                    "unsupported architecture for darknet import")
            specs[-1]["bn"] = {
                "scale": path + ("scale",),
                "bias": path + ("bias",),
                "stats_path": path,
            }
    return specs


def _get(tree, path):
    node = tree
    for k in path:
        node = node[k]
    return node


def _set(tree, path, value):
    node = tree
    for k in path[:-1]:
        node = node[k]
    node[path[-1]] = value


def _resolve_specs(params, model, input_size, order, channels=3):
    if order is None:
        if model is None:
            raise ValueError(
                "pass model= (traced for call order) or an explicit order=; "
                "walking the params dict is unsound — flax/JAX sort dict "
                "keys, so ConvBN_10 would walk before ConvBN_2")
        order = conv_call_order(model, input_size, channels=channels)
    return _layer_specs(params, order)


def load_darknet_weights(params: Dict, batch_stats: Dict, weights_file,
                         *, model=None, input_size=416, channels=3,
                         order: Optional[Sequence] = None):
    """Fill (a copy of) params/batch_stats from a Darknet weights stream.

    Args:
        weights_file: path or binary file-like.
        model: flax module used to trace the conv call order (the weight
            stream order).  Alternatively pass ``order`` from
            :func:`conv_call_order` directly.
        input_size: dummy input size for the trace.

    Returns (params, batch_stats) with imported values (float32).
    """
    import copy

    specs = _resolve_specs(params, model, input_size, order, channels)
    params = copy.deepcopy(jax_to_numpy(params))
    batch_stats = copy.deepcopy(jax_to_numpy(batch_stats))

    close = False
    if isinstance(weights_file, (str, bytes)):
        f = open(weights_file, "rb")
        close = True
    else:
        f = weights_file
    try:
        major, minor, revision = struct.unpack("<3i", f.read(12))
        if major * 10 + minor >= 2 and major < 1000 and minor < 1000:
            f.read(8)  # seen: int64
        else:
            f.read(4)  # seen: int32
        for i, layer in enumerate(specs):
            kernel = _get(params, layer["kernel"])
            kh, kw, in_f, out_f = kernel.shape
            need = 4 * out_f * (4 if "bn" in layer else
                                (1 if "bias" in layer else 0))
            need += 4 * out_f * in_f * kh * kw
            buf = f.read(need)
            if len(buf) < need:
                raise ValueError(
                    f"weights stream exhausted at conv {i}/{len(specs)} "
                    f"({'/'.join(layer['kernel'][:-1])}, "
                    f"{kh}x{kw}x{in_f}->{out_f}): architecture/weights "
                    "mismatch")
            off = 0

            def take(n):
                nonlocal off
                a = np.frombuffer(buf, np.float32, count=n, offset=off)
                off += 4 * n
                return a

            if "bn" in layer:
                beta = take(out_f)
                gamma = take(out_f)
                mean = take(out_f)
                var = take(out_f)
                _set(params, layer["bn"]["bias"], beta.copy())
                _set(params, layer["bn"]["scale"], gamma.copy())
                _set(batch_stats, layer["bn"]["stats_path"] + ("mean",),
                     mean.copy())
                _set(batch_stats, layer["bn"]["stats_path"] + ("var",),
                     var.copy())
            elif "bias" in layer:
                _set(params, layer["bias"], take(out_f).copy())
            w = take(out_f * in_f * kh * kw)
            w = w.reshape(out_f, in_f, kh, kw).transpose(2, 3, 1, 0)
            _set(params, layer["kernel"], np.ascontiguousarray(w))
        leftover = f.read()
        if leftover:
            raise ValueError(
                f"{len(leftover)} unread bytes after {len(specs)} convs: "
                "architecture/weights mismatch")
    finally:
        if close:
            f.close()
    return params, batch_stats


def save_darknet_weights(params: Dict, batch_stats: Dict, weights_file,
                         *, model=None, input_size=416, channels=3,
                         order: Optional[Sequence] = None):
    """Inverse of ``load_darknet_weights`` (round-trip testing / export)."""
    specs = _resolve_specs(params, model, input_size, order, channels)
    params = jax_to_numpy(params)
    batch_stats = jax_to_numpy(batch_stats)
    close = False
    if isinstance(weights_file, (str, bytes)):
        f = open(weights_file, "wb")
        close = True
    else:
        f = weights_file
    try:
        f.write(struct.pack("<3i", 0, 2, 0))
        f.write(struct.pack("<q", 0))
        for layer in specs:
            kernel = np.asarray(_get(params, layer["kernel"]))
            if "bn" in layer:
                f.write(np.asarray(_get(params, layer["bn"]["bias"]),
                                   np.float32).tobytes())
                f.write(np.asarray(_get(params, layer["bn"]["scale"]),
                                   np.float32).tobytes())
                stats_path = layer["bn"]["stats_path"]
                f.write(np.asarray(_get(batch_stats, stats_path + ("mean",)),
                                   np.float32).tobytes())
                f.write(np.asarray(_get(batch_stats, stats_path + ("var",)),
                                   np.float32).tobytes())
            elif "bias" in layer:
                f.write(np.asarray(_get(params, layer["bias"]),
                                   np.float32).tobytes())
            f.write(np.asarray(kernel, np.float32)
                    .transpose(3, 2, 0, 1).tobytes())
    finally:
        if close:
            f.close()


def jax_to_numpy(tree):
    import jax

    return jax.tree.map(lambda x: np.asarray(x), tree)
