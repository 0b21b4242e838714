"""UNet keypoint-heatmap model (flax, NHWC).

Capability parity with `AIServer/ai_api/ai_models/unet/model.py:6-117`:
depth-4 encoder (two conv-BN-relu then 2×2 maxpool per stage, skip tap
before pooling), a bottom stage, and a decoder whose stages bilinear-resize
the skip to the upsampled size, concat, run two convs, then
upsample → BN → sigmoid.  The 1×1 head + sigmoid reads the *pre-upsample*
output of the last decoder stage (`unet/model.py:113-116`).

Training harness parity (`unet/train.py:20-115`): BCE loss on heatmaps with
``clip_by_global_norm(10)`` — see ``make_unet_loss_fn``.
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from tmv_tpu.models.layers.common import resize_bilinear
from tmv_tpu.ops.losses import sigmoid_cross_entropy


class UNetConv(nn.Module):
    filters: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.filters, (3, 3), padding="SAME",
            kernel_init=nn.initializers.he_normal(), dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3,
            dtype=self.dtype,
        )(x)
        return nn.relu(x)


class DownSample(nn.Module):
    filters: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = UNetConv(self.filters, self.dtype)(x, train)
        x = UNetConv(self.filters, self.dtype)(x, train)
        p = x
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return p, x


class UpSample(nn.Module):
    """Two convs then upsample+BN+sigmoid; optionally merges a skip first."""

    filters: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None, train: bool = False):
        if skip is not None:
            skip = resize_bilinear(skip, (x.shape[1], x.shape[2]))
            x = jnp.concatenate([skip, x], axis=-1)
        x = UNetConv(self.filters, self.dtype)(x, train)
        x = UNetConv(self.filters, self.dtype)(x, train)
        p = x
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)  # UpSampling2D(2)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3,
            dtype=self.dtype,
        )(x)
        x = nn.sigmoid(x)
        return p, x


class UNet(nn.Module):
    depth: int = 4
    filters_base: int = 64
    output_filters: int = 1
    dtype: Any = jnp.float32
    remat: bool = False

    def _stages(self):
        """remat: block-level rematerialization — exact, same variable tree
        (explicit names pin the direct autonames; see YoloV4.remat)."""
        if self.remat:
            return (nn.remat(DownSample, static_argnums=(2,)),
                    nn.remat(UpSample, static_argnums=(3,)))
        return DownSample, UpSample

    @nn.compact
    def __call__(self, x, train: bool = False):
        Down, Up = self._stages()
        skips = []
        for d in range(self.depth):
            p, x = Down(self.filters_base * 2**d, self.dtype,
                        name=f"DownSample_{d}")(x, train)
            skips.append(p)
        skips = skips[::-1]
        _, x = Up(self.filters_base * 2**self.depth, self.dtype,
                  name="UpSample_0")(x, None, train)
        for i in range(self.depth):
            # decoder filter sizes run high→low (upsample_layers reversed,
            # unet/model.py:96-97)
            f = self.filters_base * 2 ** (self.depth - 1 - i)
            p, x = Up(f, self.dtype, name=f"UpSample_{i + 1}")(
                x, skips[i], train)
        out = nn.Conv(self.output_filters, (1, 1), padding="SAME",
                      dtype=self.dtype)(p)
        return nn.sigmoid(out)


class UNetLogits(UNet):
    """Forward variant that returns the 1×1-head logits (loss wants logits)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        Down, Up = self._stages()
        skips = []
        for d in range(self.depth):
            p, x = Down(self.filters_base * 2**d, self.dtype,
                        name=f"DownSample_{d}")(x, train)
            skips.append(p)
        skips = skips[::-1]
        _, x = Up(self.filters_base * 2**self.depth, self.dtype,
                  name="UpSample_0")(x, None, train)
        for i in range(self.depth):
            f = self.filters_base * 2 ** (self.depth - 1 - i)
            p, x = Up(f, self.dtype, name=f"UpSample_{i + 1}")(
                x, skips[i], train)
        return nn.Conv(self.output_filters, (1, 1), padding="SAME",
                       dtype=self.dtype)(p)


def make_unet_loss_fn(model: UNetLogits):
    """BCE-on-heatmaps loss for ``make_train_step``.

    The reference trains with ``BinaryCrossentropy`` over sigmoid outputs
    (`unet/train.py:28-47`); numerically this is BCE-from-logits here.
    """

    def loss_fn(params, batch_stats, batch, rng):
        images, targets = batch["image"], batch["target"]
        logits, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images, train=True, mutable=["batch_stats"],
        )
        loss = jnp.mean(sigmoid_cross_entropy(targets, logits))
        return loss, (mutated["batch_stats"], {})

    return loss_fn
