"""Keras-h5 name-mapped checkpoint importer.

Parity surface: `AIServer/ai_api/ai_models/yolo_v3/convert_tf2.py:22-48`
(and the yolo_v4 twin) — reads the ``.h5`` file written by the reference's
Darknet converter (a Keras *functional* model) and assigns weights into the
training model by variable name.

TPU-native equivalent: the h5 file's ``layer_names`` attribute stores
layers in creation order (= Darknet cfg order for converter output), so the
ordered (conv, bn) stream maps onto the flax conv *call order* traced by
``convert.darknet.conv_call_order`` — the same pairing machinery as the
binary importer.  Keras Conv2D kernels are already ``(h, w, in, out)``
(flax layout), so no transposes are needed; BN maps gamma→scale, beta→bias,
moving_mean/variance→batch_stats.

``save_keras_h5_weights`` writes the same layout (Keras-compatible layer /
weight naming) so the mapping is round-trip-testable without shipping
reference weights.
"""

import copy
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from tmv_tpu.convert.darknet import (
    _get, _layer_specs, _resolve_specs, _set, jax_to_numpy,
)

_BN_KEYS = ("gamma", "beta", "moving_mean", "moving_variance")


def _decode(s):
    return s.decode("utf8") if isinstance(s, bytes) else s


def read_keras_h5(h5_file) -> List[Tuple[str, Dict[str, np.ndarray]]]:
    """h5 → ordered [('conv'|'bn', {weight_name: array}), ...].

    Order comes from the file's ``layer_names`` attribute (layer creation
    order).  Weightless layers (padding, upsample, ...) are skipped.
    """
    import h5py

    with h5py.File(h5_file, "r") as f:
        g = f["model_weights"] if "model_weights" in f else f
        items: List[Tuple[str, Dict[str, np.ndarray]]] = []
        for ln in [_decode(s) for s in g.attrs["layer_names"]]:
            grp = g[ln]
            wnames = [_decode(s) for s in grp.attrs.get("weight_names", [])]
            if not wnames:
                continue
            weights = {
                wn.split("/")[-1].split(":")[0]: np.asarray(grp[wn])
                for wn in wnames
            }
            if "kernel" in weights:
                items.append(("conv", weights))
            elif any(k in weights for k in _BN_KEYS):
                items.append(("bn", weights))
        return items


def load_keras_h5_weights(params: Dict, batch_stats: Dict, h5_file,
                          *, model=None, input_size=416, channels=3,
                          order: Optional[Sequence] = None,
                          strict: bool = True):
    """Fill (a copy of) params/batch_stats from a Keras functional-model h5.

    Args:
        model: flax module to trace for conv call order (or pass ``order``).
        strict: raise on shape mismatch; if False, skip with a report entry
            (the reference prints and skips, `convert_tf2.py:44-46`).

    Returns (params, batch_stats, skipped) — ``skipped`` lists
    ``(h5_layer_index, flax_path, h5_shape, expected_shape)`` for weights
    not assigned (empty when strict).
    """
    specs = _resolve_specs(params, model, input_size, order, channels)
    params = copy.deepcopy(jax_to_numpy(params))
    batch_stats = copy.deepcopy(jax_to_numpy(batch_stats))
    items = read_keras_h5(h5_file)
    skipped: List = []

    it = iter(enumerate(items))

    def next_item(kind, for_path):
        try:
            i, (k, w) = next(it)
        except StopIteration:
            raise ValueError(
                f"h5 exhausted: no {kind} layer left for "
                f"{'/'.join(for_path)} — architecture/h5 mismatch")
        if k != kind:
            raise ValueError(
                f"h5 layer {i} is a {k}, expected {kind} for "
                f"{'/'.join(for_path)} — architecture/h5 mismatch")
        return i, w

    def assign(i, tree, path, value):
        cur = _get(tree, path)
        if tuple(cur.shape) != tuple(value.shape):
            if strict:
                raise ValueError(
                    f"shape mismatch at h5 layer {i} → {'/'.join(path)}: "
                    f"h5 {tuple(value.shape)} vs model {tuple(cur.shape)}")
            skipped.append((i, path, tuple(value.shape), tuple(cur.shape)))
            return
        _set(tree, path, np.asarray(value, np.float32))

    for spec in specs:
        i, w = next_item("conv", spec["kernel"])
        assign(i, params, spec["kernel"], w["kernel"])
        if "bias" in spec and "bias" in w:
            assign(i, params, spec["bias"], w["bias"])
        if "bn" in spec:
            i, w = next_item("bn", spec["bn"]["stats_path"])
            assign(i, params, spec["bn"]["scale"], w["gamma"])
            assign(i, params, spec["bn"]["bias"], w["beta"])
            assign(i, batch_stats, spec["bn"]["stats_path"] + ("mean",),
                   w["moving_mean"])
            assign(i, batch_stats, spec["bn"]["stats_path"] + ("var",),
                   w["moving_variance"])
    rest = list(it)
    if rest:
        raise ValueError(
            f"{len(rest)} unconsumed h5 weight layers (first: index "
            f"{rest[0][0]}, kind {rest[0][1][0]}) — architecture/h5 "
            "mismatch")
    return params, batch_stats, skipped


def save_keras_h5_weights(params: Dict, batch_stats: Dict, h5_file,
                          *, model=None, input_size=416, channels=3,
                          order: Optional[Sequence] = None):
    """Inverse of ``load_keras_h5_weights`` (Keras-compatible layout)."""
    import h5py

    specs = _resolve_specs(params, model, input_size, order, channels)
    params = jax_to_numpy(params)
    batch_stats = jax_to_numpy(batch_stats)

    with h5py.File(h5_file, "w") as f:
        layer_names = []
        conv_i = bn_i = 0

        def put(name, weights):
            grp = f.create_group(name) if name not in f else f[name]
            wnames = []
            for wn, val in weights.items():
                full = f"{name}/{wn}:0"
                grp.create_dataset(full, data=np.asarray(val, np.float32))
                wnames.append(full.encode("utf8"))
            grp.attrs["weight_names"] = wnames
            layer_names.append(name.encode("utf8"))

        for spec in specs:
            name = f"conv2d_{conv_i}" if conv_i else "conv2d"
            conv_i += 1
            weights = {"kernel": _get(params, spec["kernel"])}
            if "bias" in spec:
                weights["bias"] = _get(params, spec["bias"])
            put(name, weights)
            if "bn" in spec:
                name = (f"batch_normalization_{bn_i}" if bn_i
                        else "batch_normalization")
                bn_i += 1
                sp = spec["bn"]["stats_path"]
                put(name, {
                    "gamma": _get(params, spec["bn"]["scale"]),
                    "beta": _get(params, spec["bn"]["bias"]),
                    "moving_mean": _get(batch_stats, sp + ("mean",)),
                    "moving_variance": _get(batch_stats, sp + ("var",)),
                })
        f.attrs["layer_names"] = layer_names
