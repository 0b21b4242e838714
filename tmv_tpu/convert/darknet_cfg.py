"""Generic Darknet ``.cfg`` parser + model builder.

Parity surface: `AIServer/ai_api/ai_models/yolo_v3/convert.py:44-270` builds
a Keras model *from the cfg file*, so it can import weights for any Darknet
architecture, not just the two hard-coded ones.  This module does the same
TPU-first: ``parse_darknet_cfg`` reads the cfg (with the reference's
unique-section counting, `convert.py:44-56`), ``DarknetCfgNet`` is a flax
module that interprets the section list (convolutional / shortcut / route /
upsample / maxpool / yolo), and because its convs execute in cfg order the
traced-order importer (``convert.darknet``) loads ``.weights`` files into it
directly, with per-layer diagnostics on mismatch.

Supported sections (the ones YOLOv3/v4(-tiny) use):
- ``[convolutional]``: filters/size/stride/pad/batch_normalize/activation
  (leaky | mish | linear).  Stride-2 uses Darknet's top-left zero pad.
- ``[shortcut]``: residual add with layer ``from`` (linear activation).
- ``[route]``: concat of ``layers`` (negative = relative); optional
  ``groups``/``group_id`` slicing (v4-tiny).
- ``[upsample]``: nearest ×stride.
- ``[maxpool]``: size/stride, SAME padding.
- ``[yolo]``: marks the previous layer as a detection output.
"""

import io
from typing import Any, List, Tuple

import flax.linen as nn
import jax.numpy as jnp

from tmv_tpu.models.layers.common import (
    ConvBN, DarknetConv, max_pool_same, upsample2x,
)
from tmv_tpu.ops.activations import leaky_relu, mish

Section = Tuple[str, Tuple[Tuple[str, str], ...]]


def parse_darknet_cfg(cfg) -> Tuple[Section, ...]:
    """Parse a Darknet cfg file/path/text into ((name, ((k, v), ...)), ...).

    Duplicate section names get ``_N`` suffixes in order of appearance
    (same scheme as the reference's ``unique_config_sections``).
    """
    if hasattr(cfg, "read"):
        text = cfg.read()
    elif "\n" in cfg or "[" == cfg.lstrip()[:1]:
        text = cfg
    else:
        with open(cfg) as f:
            text = f.read()

    sections: List[Tuple[str, List[Tuple[str, str]]]] = []
    counters: dict = {}
    for raw in io.StringIO(text):
        line = raw.split("#")[0].split(";")[0].strip()
        if not line:
            continue
        if line.startswith("["):
            name = line.strip("[]").strip()
            n = counters.get(name, 0)
            counters[name] = n + 1
            sections.append((f"{name}_{n}", []))
        else:
            if "=" not in line or not sections:
                continue
            k, v = line.split("=", 1)
            sections[-1][1].append((k.strip(), v.strip()))
    return tuple((name, tuple(kvs)) for name, kvs in sections)


def _opts(kvs) -> dict:
    return dict(kvs)


class DarknetCfgNet(nn.Module):
    """flax interpreter for a parsed Darknet cfg (NHWC, static shapes)."""

    sections: Tuple[Section, ...]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        outputs: List = []   # per parsed (non-net) section
        yolo_heads: List = []
        for name, kvs in self.sections:
            base = name.rsplit("_", 1)[0]
            o = _opts(kvs)
            if base in ("net", "network"):
                continue
            if base == "convolutional":
                filters = int(o["filters"])
                size = int(o.get("size", 1))
                stride = int(o.get("stride", 1))
                act = o.get("activation", "linear")
                if "batch_normalize" in o and o["batch_normalize"] != "0":
                    act_name = act if act in ("leaky", "mish") else "linear"
                    x = ConvBN(filters, size, strides=stride, act=act_name,
                               dtype=self.dtype)(x, train)
                else:
                    x = DarknetConv(filters, size, strides=stride,
                                    use_bias=True, dtype=self.dtype)(x)
                    if act == "leaky":
                        x = leaky_relu(x)
                    elif act == "mish":
                        x = mish(x)
            elif base == "shortcut":
                idx = int(o["from"])
                src = outputs[idx] if idx < 0 else outputs[idx]
                x = x + src
            elif base == "route":
                layer_ids = [int(v) for v in o["layers"].split(",")]
                feats = [outputs[i] for i in layer_ids]
                x = feats[0] if len(feats) == 1 else jnp.concatenate(
                    feats, axis=-1)
                groups = int(o.get("groups", 1))
                if groups > 1:
                    gid = int(o.get("group_id", 0))
                    c = x.shape[-1] // groups
                    x = x[..., gid * c:(gid + 1) * c]
            elif base == "upsample":
                x = upsample2x(x)
            elif base == "maxpool":
                size = int(o.get("size", 2))
                stride = int(o.get("stride", size))
                x = max_pool_same(x, size, stride)
            elif base == "yolo":
                yolo_heads.append(outputs[-1] if outputs else x)
            else:
                raise ValueError(f"unsupported darknet section [{base}]")
            outputs.append(x)
        return tuple(yolo_heads) if yolo_heads else x


def build_from_cfg(cfg, dtype=jnp.float32):
    """cfg (path/text/file) → (DarknetCfgNet, input_size from [net])."""
    sections = parse_darknet_cfg(cfg)
    net_opts = {}
    for name, kvs in sections:
        if name.startswith("net"):
            net_opts = _opts(kvs)
            break
    h = int(net_opts.get("height", 416))
    w = int(net_opts.get("width", 416))
    return DarknetCfgNet(sections=sections, dtype=dtype), (h, w)


def load_cfg_weights(cfg, weights_file, dtype=jnp.float32):
    """One-call flow: cfg + .weights → (model, variables dict).

    Equivalent of the reference's ``convert.py _main`` (cfg → model →
    weight assignment), producing the flax variables ready for
    ``TrainState.create`` / checkpointing.
    """
    import jax

    from tmv_tpu.convert.darknet import load_darknet_weights

    model, (h, w) = build_from_cfg(cfg, dtype=dtype)
    x0 = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x0, train=False)
    batch_stats = variables.get("batch_stats", {})
    params, batch_stats = load_darknet_weights(
        variables["params"], batch_stats, weights_file,
        model=model, input_size=(h, w))
    return model, {"params": params, "batch_stats": batch_stats}
