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

Because the flax models here define layers in exactly the Darknet config
order, the parameter pytree's insertion order *is* the weight-stream order:
the importer walks the tree, pairing each conv kernel with its BN table or
bias, and consumes the stream.  ``save_darknet_weights`` is the inverse —
it exists so the mapping is round-trip-testable without shipping the
original weight files.
"""

import io
import struct
from typing import Any, Dict, List, Tuple

import numpy as np


def _walk_conv_layers(params: Dict, batch_stats: Dict) -> List[Dict]:
    """Ordered conv-layer specs: kernel path + (bn paths | bias path).

    Walks the params tree in insertion (call) order.  A conv kernel inside a
    ``ConvBN`` is followed (in its parent subtree) by a BatchNorm; a bare
    ``DarknetConv`` kernel pairs with its own bias.
    """
    layers: List[Dict] = []

    def bn_stats_at(path: Tuple[str, ...]):
        node = batch_stats
        for k in path:
            node = node[k]
        return node

    def visit(node: Dict, path: Tuple[str, ...]):
        keys = list(node.keys())
        # Is this a ConvBN-shaped module? (conv child + batchnorm child)
        conv_children = [k for k in keys if k.startswith("DarknetConv")]
        bn_children = [k for k in keys if k.startswith("BatchNorm")]
        for k in keys:
            child = node[k]
            if not isinstance(child, dict):
                continue
            if k.startswith("Conv_"):
                # bare flax Conv holding kernel (+ maybe bias)
                entry = {"kernel": path + (k, "kernel")}
                if "bias" in child:
                    entry["bias"] = path + (k, "bias")
                layers.append(entry)
            else:
                visit(child, path + (k,))
        # attach BN info to the conv that precedes it within this module
        if conv_children and bn_children:
            bn_path = path + (bn_children[0],)
            layers[-1]["bn"] = {
                "scale": bn_path + ("scale",),
                "bias": bn_path + ("bias",),
                "stats": bn_stats_at(bn_path),
                "stats_path": bn_path,
            }

    visit(params, ())
    return layers


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


def load_darknet_weights(params: Dict, batch_stats: Dict, weights_file):
    """Fill (a copy of) params/batch_stats from a Darknet weights stream.

    Args:
        weights_file: path or binary file-like.

    Returns (params, batch_stats) with imported values (float32).
    """
    import copy

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
        for layer in _walk_conv_layers(params, batch_stats):
            kernel = _get(params, layer["kernel"])
            kh, kw, in_f, out_f = kernel.shape
            if "bn" in layer:
                beta = np.frombuffer(f.read(4 * out_f), np.float32)
                gamma = np.frombuffer(f.read(4 * out_f), np.float32)
                mean = np.frombuffer(f.read(4 * out_f), np.float32)
                var = np.frombuffer(f.read(4 * out_f), np.float32)
                _set(params, layer["bn"]["bias"], beta.copy())
                _set(params, layer["bn"]["scale"], gamma.copy())
                _set(batch_stats, layer["bn"]["stats_path"] + ("mean",),
                     mean.copy())
                _set(batch_stats, layer["bn"]["stats_path"] + ("var",),
                     var.copy())
            elif "bias" in layer:
                bias = np.frombuffer(f.read(4 * out_f), np.float32)
                _set(params, layer["bias"], bias.copy())
            n = out_f * in_f * kh * kw
            w = np.frombuffer(f.read(4 * n), np.float32)
            w = w.reshape(out_f, in_f, kh, kw).transpose(2, 3, 1, 0)
            _set(params, layer["kernel"], np.ascontiguousarray(w))
        leftover = f.read()
        if leftover:
            raise ValueError(
                f"{len(leftover)} unread bytes: architecture/weights mismatch"
            )
    finally:
        if close:
            f.close()
    return params, batch_stats


def save_darknet_weights(params: Dict, batch_stats: Dict, weights_file):
    """Inverse of ``load_darknet_weights`` (round-trip testing / export)."""
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
        for layer in _walk_conv_layers(params, batch_stats):
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
