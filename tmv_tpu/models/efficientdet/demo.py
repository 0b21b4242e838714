"""Toy 7-conv pyramid detector: the anchors/focal/box-loss validation rig.

Parity surface: `AIServer/ai_api/ai_models/efficientnet/demo/model.py:3-43`
(+ `demo/demo_model_train.py`, `demo/train.py`): seven conv+maxpool stages;
stages 2..6 emit 9-anchor class and box heads — used to validate the anchor
target/decode/loss stack end-to-end before the full EfficientDet.
"""

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from tmv_tpu.ops.losses import box_loss, focal_loss


class DemoModel(nn.Module):
    num_classes: int = 81
    num_anchors: int = 9
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        classes_outputs = []
        boxes_outputs = []
        for i in range(7):
            x = nn.Conv(20 * (i + 1), (3, 3), padding="SAME",
                        dtype=self.dtype)(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2), padding="SAME")
            if i > 1:
                b, h, w, _ = x.shape
                cls = nn.Conv(self.num_anchors * self.num_classes, (1, 1),
                              padding="SAME", dtype=self.dtype)(x)
                classes_outputs.append(
                    cls.reshape(b, h, w, self.num_anchors, -1))
                box = nn.Conv(self.num_anchors * 4, (1, 1), padding="SAME",
                              dtype=self.dtype)(x)
                boxes_outputs.append(
                    box.reshape(b, h, w, self.num_anchors, -1))
        return tuple(classes_outputs), tuple(boxes_outputs)


def make_demo_loss_fn(model: DemoModel, alpha=0.25, gamma=1.5):
    """Same loss shape as EfficientDetTrain (`demo/demo_model_train.py`)."""
    import jax.numpy as jnp

    def loss_fn(params, batch_stats, batch, rng):
        classes_out, boxes_out = model.apply({"params": params},
                                             batch["image"], train=True)
        num_positives = 1.0
        for m in batch["masks"]:
            num_positives += jnp.sum(m.astype(jnp.float32))
        loss = 0.0
        for level in range(len(boxes_out)):
            loss += box_loss(batch["boxes"][level], boxes_out[level],
                             num_positives) * 50.0
            loss += jnp.mean(focal_loss(
                batch["classes"][level], classes_out[level], num_positives,
                alpha=alpha, gamma=gamma))
        return loss, (batch_stats, {})

    return loss_fn
