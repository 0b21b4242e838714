"""InceptionV4 (flax/NHWC).

Parity surface: `AIServer/ai_api/ai_models/backbones/inception_v4.py:28-60` —
stem + 4×A, ReductionA(192,224,256,384), 7×B, ReductionB, 3×C, adaptive avg
pool → dropout → dense head.
"""

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from tmv_tpu.models.backbones.inception_modules import (
    InceptionBlockA,
    InceptionBlockB,
    InceptionBlockC,
    InceptionStem,
    ReductionA,
    ReductionBV4,
)


class InceptionV4(nn.Module):
    classes: int
    dropout_rate: float = 0.2
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        # remat: block-level rematerialization — exact, same variable tree
        # (explicit names pin the direct autonames; see YoloV4.remat)
        def R(cls):
            return (nn.remat(cls, static_argnums=(2,))
                    if self.remat else cls)

        x = InceptionStem(self.dtype)(x, train)
        for i in range(4):
            x = R(InceptionBlockA)(
                self.dtype, name=f"InceptionBlockA_{i}")(x, train)
        x = ReductionA(192, 224, 256, 384, self.dtype)(x, train)
        for i in range(7):
            x = R(InceptionBlockB)(
                self.dtype, name=f"InceptionBlockB_{i}")(x, train)
        x = ReductionBV4(self.dtype)(x, train)
        for i in range(3):
            x = R(InceptionBlockC)(
                self.dtype, name=f"InceptionBlockC_{i}")(x, train)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return nn.Dense(self.classes, dtype=self.dtype)(x)
