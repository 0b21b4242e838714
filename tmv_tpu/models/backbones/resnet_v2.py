"""ResNetV2 (pre-activation) backbone with Keras-compatible taps.

The MoCo / distillation families build their YOLO-shaped heads on
``tf.keras.applications.ResNet50V2`` feature taps ``conv5_block3_out``,
``conv4_block5_out``, ``conv3_block3_out``
(`momentum_contrast/model.py:49-54`).  This is a faithful flax
re-implementation of Keras' resnet_v2 stack/block structure (pre-act BN,
stride in the *last* block of each stack, conv shortcut on the first block,
max-pool shortcut on strided blocks), returning those three taps.
ImageNet weights are not bundled (zero-egress build); ``backbone_weights``
has no counterpart here — train from scratch or load a converted checkpoint.
"""

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class BlockV2(nn.Module):
    filters: int
    stride: int = 1
    conv_shortcut: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        preact = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                              epsilon=1.001e-5, dtype=self.dtype)(x)
        preact = nn.relu(preact)
        if self.conv_shortcut:
            shortcut = nn.Conv(4 * self.filters, (1, 1),
                               strides=(self.stride, self.stride),
                               dtype=self.dtype)(preact)
        elif self.stride > 1:
            shortcut = nn.max_pool(x, (1, 1),
                                   strides=(self.stride, self.stride))
        else:
            shortcut = x
        y = nn.Conv(self.filters, (1, 1), use_bias=False,
                    dtype=self.dtype)(preact)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1.001e-5, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1.001e-5, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(4 * self.filters, (1, 1), dtype=self.dtype)(y)
        return shortcut + y


class StackV2(nn.Module):
    filters: int
    blocks: int
    stride1: int = 2
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, tap_block: int | None = None):
        Block = (nn.remat(BlockV2, static_argnums=(2,))
                 if self.remat else BlockV2)
        tap = None
        x = Block(self.filters, conv_shortcut=True, dtype=self.dtype,
                  name="block1")(x, train)
        if tap_block == 1:
            tap = x
        for i in range(2, self.blocks):
            x = Block(self.filters, dtype=self.dtype,
                      name=f"block{i}")(x, train)
            if tap_block == i:
                tap = x
        x = Block(self.filters, stride=self.stride1, dtype=self.dtype,
                  name=f"block{self.blocks}")(x, train)
        if tap_block == self.blocks:
            tap = x
        return x, tap


class ResNet50V2(nn.Module):
    """Feature extractor returning (conv5_block3_out, conv4_block5_out,
    conv3_block3_out) at strides (32, 16, 8).

    ``remat=True``: block-level rematerialization (see ``YoloV4.remat``) —
    exact, same variable tree.
    """

    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple:
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=True, dtype=self.dtype, name="conv1")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        x, _ = StackV2(64, 3, dtype=self.dtype, remat=self.remat,
                       name="conv2")(x, train)
        x, y3 = StackV2(128, 4, dtype=self.dtype, remat=self.remat,
                        name="conv3")(x, train, tap_block=3)
        x, y2 = StackV2(256, 6, dtype=self.dtype, remat=self.remat,
                        name="conv4")(x, train, tap_block=5)
        x, y1 = StackV2(512, 3, stride1=1, dtype=self.dtype,
                        remat=self.remat, name="conv5")(x, train,
                                                        tap_block=3)
        return y1, y2, y3
