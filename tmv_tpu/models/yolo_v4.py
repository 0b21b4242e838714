"""YOLOv4: CSPDarknet-53 + SPP + PANet, Mish backbone (flax, NHWC).

Capability parity with `AIServer/ai_api/ai_models/yolo_v4/model.py:12-279`:

- ``BlocksLayer`` (`:12-50`): stride-2 downsample then two CSP branches
  (branch1 = 1×1; branch2 = 1×1 → [1×1-half → 3×3] residual → 1×1),
  concat(branch2, branch1) then 1×1 merge — Mish throughout.
- ``BlocksLayer2`` (`:52-95`): same shape but half-filter branches with
  ``blocks_num`` residual sub-blocks.
- ``LastLayer`` (`:97-131`): 3 convs + SPP (maxpool 5/9/13, concat reversed)
  + 3 convs, Leaky.
- ``LastLayer2`` (`:133-165`): top-down upsample-concat + 5 convs (PAN up).
- ``OutputLayer``/``OutputLayer2`` (`:167-219`): bottom-up downsample-concat
  (PAN down) and the 3×3 pre-head convs; bias-full 1×1 output convs.
- ``YoloV4ModelBase.call`` (`:221-279`): returns (z1, z2, z3) =
  (13², 26², 52²) raw heads at 416 input.

Train/predict wrappers: shadow-loss EMA + CIoU loss + DIoU-NMS are composed
from `core.train_state` and `ops.yolo` (see `models/detector_harness.py`).
"""

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from tmv_tpu.models.layers.common import ConvBN, DarknetConv, max_pool_same, upsample2x


class BlocksLayer(nn.Module):
    """First CSP stage (full-width branches), `yolo_v4/model.py:12-50`."""

    filters: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.filters
        x = ConvBN(f, 3, strides=2, act="mish", dtype=self.dtype)(x, train)
        x1 = ConvBN(f, 1, act="mish", dtype=self.dtype)(x, train)
        x2_1 = ConvBN(f, 1, act="mish", dtype=self.dtype)(x, train)
        x2_2 = ConvBN(f // 2, 1, act="mish", dtype=self.dtype)(x2_1, train)
        x2_2 = ConvBN(f, 3, act="mish", dtype=self.dtype)(x2_2, train)
        x2 = x2_1 + x2_2
        x2 = ConvBN(f, 1, act="mish", dtype=self.dtype)(x2, train)
        x = jnp.concatenate([x2, x1], axis=-1)
        return ConvBN(f, 1, act="mish", dtype=self.dtype)(x, train)


class BlocksLayer2(nn.Module):
    """CSP stage with half-width branches, `yolo_v4/model.py:52-95`."""

    filters: int
    blocks_num: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.filters
        x = ConvBN(f, 3, strides=2, act="mish", dtype=self.dtype)(x, train)
        x1 = ConvBN(f // 2, 1, act="mish", dtype=self.dtype)(x, train)
        x2_1 = ConvBN(f // 2, 1, act="mish", dtype=self.dtype)(x, train)
        for _ in range(self.blocks_num):
            x2_2 = ConvBN(f // 2, 1, act="mish", dtype=self.dtype)(x2_1, train)
            x2_2 = ConvBN(f // 2, 3, act="mish", dtype=self.dtype)(x2_2, train)
            x2_1 = x2_1 + x2_2
        x2 = ConvBN(f // 2, 1, act="mish", dtype=self.dtype)(x2_1, train)
        x = jnp.concatenate([x2, x1], axis=-1)
        return ConvBN(f, 1, act="mish", dtype=self.dtype)(x, train)


class LastLayer(nn.Module):
    """3conv + SPP + 3conv neck, `yolo_v4/model.py:97-131`."""

    filters: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.filters
        x = ConvBN(f, 1, act="leaky", dtype=self.dtype)(x, train)
        x = ConvBN(f * 2, 3, act="leaky", dtype=self.dtype)(x, train)
        x = ConvBN(f, 1, act="leaky", dtype=self.dtype)(x, train)
        x2 = max_pool_same(x, 5)
        x3 = max_pool_same(x, 9)
        x4 = max_pool_same(x, 13)
        x = jnp.concatenate([x4, x3, x2, x], axis=-1)
        x = ConvBN(f, 1, act="leaky", dtype=self.dtype)(x, train)
        x = ConvBN(f * 2, 3, act="leaky", dtype=self.dtype)(x, train)
        return ConvBN(f, 1, act="leaky", dtype=self.dtype)(x, train)


class LastLayer2(nn.Module):
    """PAN top-down merge, `yolo_v4/model.py:133-165`."""

    filters: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        f = self.filters
        x1 = ConvBN(f, 1, act="leaky", dtype=self.dtype)(x1, train)
        x1 = upsample2x(x1)
        x2 = ConvBN(f, 1, act="leaky", dtype=self.dtype)(x2, train)
        x = jnp.concatenate([x2, x1], axis=-1)
        x = ConvBN(f, 1, act="leaky", dtype=self.dtype)(x, train)
        x = ConvBN(f * 2, 3, act="leaky", dtype=self.dtype)(x, train)
        x = ConvBN(f, 1, act="leaky", dtype=self.dtype)(x, train)
        x = ConvBN(f * 2, 3, act="leaky", dtype=self.dtype)(x, train)
        return ConvBN(f, 1, act="leaky", dtype=self.dtype)(x, train)


class OutputLayer2(nn.Module):
    """PAN bottom-up merge + pre-head conv, `yolo_v4/model.py:183-219`."""

    filters: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y, train: bool = False):
        f = self.filters
        x = ConvBN(f, 3, strides=2, act="leaky", dtype=self.dtype)(x, train)
        x = jnp.concatenate([x, y], axis=-1)
        x = ConvBN(f, 1, act="leaky", dtype=self.dtype)(x, train)
        x = ConvBN(f * 2, 3, act="leaky", dtype=self.dtype)(x, train)
        x = ConvBN(f, 1, act="leaky", dtype=self.dtype)(x, train)
        x = ConvBN(f * 2, 3, act="leaky", dtype=self.dtype)(x, train)
        x = ConvBN(f, 1, act="leaky", dtype=self.dtype)(x, train)
        y_out = ConvBN(f * 2, 3, act="leaky", dtype=self.dtype)(x, train)
        return y_out, x


class YoloV4(nn.Module):
    """Forward network: image → (z1, z2, z3) raw heads (strides 32/16/8).

    ``remat=True`` wraps every stage module in ``nn.remat`` (block-level
    rematerialization): the backward pass recomputes each stage's interior
    activations instead of storing them, so peak HBM drops from
    O(all activations) to O(stage boundaries + largest stage) for ~one
    extra forward of FLOPs — the standard TPU lever for high-resolution /
    large-batch training on one chip.  Exact: the variable tree and the
    gradients are bitwise identical to the direct model (pinned by
    ``tests/test_harness_extras.py::TestRemat``).  No reference
    counterpart (the reference trains small-batch without checkpointing).
    """

    classes_num: int
    anchors_num: int = 3
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple:
        if self.remat:
            Blocks = nn.remat(BlocksLayer, static_argnums=(2,))
            Blocks2 = nn.remat(BlocksLayer2, static_argnums=(2,))
            Last = nn.remat(LastLayer, static_argnums=(2,))
            Last2 = nn.remat(LastLayer2, static_argnums=(3,))
            Out2 = nn.remat(OutputLayer2, static_argnums=(3,))
        else:
            Blocks, Blocks2 = BlocksLayer, BlocksLayer2
            Last, Last2, Out2 = LastLayer, LastLayer2, OutputLayer2
        # explicit names pin the direct model's autonames so the variable
        # tree (and hence checkpoints) is identical with/without remat
        out_filters = self.anchors_num * (5 + self.classes_num)
        x = ConvBN(32, 3, act="mish", dtype=self.dtype)(x, train)
        x = Blocks(64, self.dtype, name="BlocksLayer_0")(x, train)
        x = Blocks2(128, 2, self.dtype, name="BlocksLayer2_0")(x, train)
        x = Blocks2(256, 8, self.dtype, name="BlocksLayer2_1")(x, train)
        y3 = x
        x = Blocks2(512, 8, self.dtype, name="BlocksLayer2_2")(x, train)
        y2 = x
        x = Blocks2(1024, 4, self.dtype, name="BlocksLayer2_3")(x, train)
        y1 = x

        y1 = Last(512, self.dtype, name="LastLayer_0")(y1, train)
        y2 = Last2(256, self.dtype, name="LastLayer2_0")(y1, y2, train)
        y3 = Last2(128, self.dtype, name="LastLayer2_1")(y2, y3, train)

        # z3: 52² head (3×3 pre-conv = OutputLayer, yolo_v4/model.py:167-181)
        z3 = ConvBN(128 * 2, 3, act="leaky", dtype=self.dtype)(y3, train)
        z3 = DarknetConv(out_filters, 1, dtype=self.dtype)(z3)
        # z2: 26² head via PAN down from y3
        z2, y2 = Out2(256, self.dtype, name="OutputLayer2_0")(y3, y2, train)
        z2 = DarknetConv(out_filters, 1, dtype=self.dtype)(z2)
        # z1: 13² head via PAN down from y2
        z1, y1 = Out2(512, self.dtype, name="OutputLayer2_1")(y2, y1, train)
        z1 = DarknetConv(out_filters, 1, dtype=self.dtype)(z1)
        return z1, z2, z3
