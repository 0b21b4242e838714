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

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = InceptionStem(self.dtype)(x, train)
        for _ in range(4):
            x = InceptionBlockA(self.dtype)(x, train)
        x = ReductionA(192, 224, 256, 384, self.dtype)(x, train)
        for _ in range(7):
            x = InceptionBlockB(self.dtype)(x, train)
        x = ReductionBV4(self.dtype)(x, train)
        for _ in range(3):
            x = InceptionBlockC(self.dtype)(x, train)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return nn.Dense(self.classes, dtype=self.dtype)(x)
