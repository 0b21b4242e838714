"""YOLOv3: Darknet-53 backbone + FPN-style 3-scale head (flax, NHWC).

Capability parity with `AIServer/ai_api/ai_models/yolo_v3/model.py`:

- ``ResblockBody`` (`:7-37`): top-left-padded stride-2 3×3 conv, then
  ``num_blocks`` × (1×1 half-filters → 3×3 full) residual adds.
- ``DarknetBody`` (`:44-70`): 32-filter stem then stages 64/1, 128/2,
  256/8, 512/8, 1024/4 with feature taps after stages 3..5.
- ``LastLayers`` (`:73-99`): alternating 1×1/3×3 conv block returning both
  the 5-conv tap (for the top-down path) and the 6-conv output.
- ``YoloV3ModelBase.call`` (`:105-155`): upsample+concat top-down merges and
  a bias-full 1×1 output conv per scale → raw heads
  ``(B, h, w, A*(5+C))`` at strides 32/16/8.

The training wrapper behaviors (shadow-loss EMA train step, per-batch mAP
test step, layer freezing) live in ``core.train_state`` /
``models.detector_harness`` — not in the network module.
"""

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from tmv_tpu.models.layers.common import ConvBN, DarknetConv, upsample2x


class ResblockBody(nn.Module):
    num_filters: int
    num_blocks: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(self.num_filters, 3, strides=2, act="leaky",
                   dtype=self.dtype)(x, train)
        for _ in range(self.num_blocks):
            y = ConvBN(self.num_filters // 2, 1, act="leaky",
                       dtype=self.dtype)(x, train)
            y = ConvBN(self.num_filters, 3, act="leaky",
                       dtype=self.dtype)(y, train)
            x = x + y
        return x


class DarknetBody(nn.Module):
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        # explicit names pin the direct model's autonames so the variable
        # tree (and hence checkpoints) is identical with/without remat
        Block = (nn.remat(ResblockBody, static_argnums=(2,))
                 if self.remat else ResblockBody)
        x = ConvBN(32, 3, act="leaky", dtype=self.dtype)(x, train)
        x = Block(64, 1, self.dtype, name="ResblockBody_0")(x, train)
        x = Block(128, 2, self.dtype, name="ResblockBody_1")(x, train)
        x = Block(256, 8, self.dtype, name="ResblockBody_2")(x, train)
        y3 = x
        x = Block(512, 8, self.dtype, name="ResblockBody_3")(x, train)
        y2 = x
        x = Block(1024, 4, self.dtype, name="ResblockBody_4")(x, train)
        return x, y2, y3


class LastLayers(nn.Module):
    num_filters: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.num_filters
        x = ConvBN(f, 1, act="leaky", dtype=self.dtype)(x, train)
        x = ConvBN(f * 2, 3, act="leaky", dtype=self.dtype)(x, train)
        x = ConvBN(f, 1, act="leaky", dtype=self.dtype)(x, train)
        x = ConvBN(f * 2, 3, act="leaky", dtype=self.dtype)(x, train)
        x = ConvBN(f, 1, act="leaky", dtype=self.dtype)(x, train)
        y = ConvBN(f * 2, 3, act="leaky", dtype=self.dtype)(x, train)
        return x, y


class YoloV3(nn.Module):
    """Forward network: image → 3 raw heads (13², 26², 52² at 416 input).

    ``remat=True``: block-level rematerialization (see ``YoloV4.remat``) —
    exact, same variable tree, peak-HBM lever for large-batch training.
    """

    classes_num: int
    anchors_num: int = 3
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple:
        Last = (nn.remat(LastLayers, static_argnums=(2,))
                if self.remat else LastLayers)
        out_filters = self.anchors_num * (self.classes_num + 5)
        y1, y2, y3 = DarknetBody(self.dtype, remat=self.remat)(x, train)

        x, h1 = Last(512, self.dtype, name="LastLayers_0")(y1, train)
        h1 = DarknetConv(out_filters, 1, dtype=self.dtype)(h1)

        x = ConvBN(256, 1, act="leaky", dtype=self.dtype)(x, train)
        x = upsample2x(x)
        x = jnp.concatenate([x, y2], axis=-1)
        x, h2 = Last(256, self.dtype, name="LastLayers_1")(x, train)
        h2 = DarknetConv(out_filters, 1, dtype=self.dtype)(h2)

        x = ConvBN(128, 1, act="leaky", dtype=self.dtype)(x, train)
        x = upsample2x(x)
        x = jnp.concatenate([x, y3], axis=-1)
        x, h3 = Last(128, self.dtype, name="LastLayers_2")(x, train)
        h3 = DarknetConv(out_filters, 1, dtype=self.dtype)(h3)
        return h1, h2, h3
