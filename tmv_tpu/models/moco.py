"""MoCo momentum-contrast pretraining on the ResNetV2-YOLO tower.

Parity surface: `AIServer/ai_api/ai_models/momentum_contrast/model.py`:
- query/key towers = ResNet50V2 taps + YOLOv3-shaped neck/heads (`:39-99`,
  shared with the distillation family — ``ResNetYoloV3``);
- K×C negative queue as non-trainable state with a ring-buffer push
  (`:284-314`);
- InfoNCE loss over l2-normalized flattened 3-scale outputs, T=0.07
  (`:316-348`, lives in ``ops.losses.moco_info_nce_loss``);
- train step (`:350-398`): key forward (stop-grad), query grad step,
  momentum update q→k with warmup decay, enqueue keys.

TPU re-design: queue/pointer/key-params live in ``TrainState.extra`` (a
``MocoState`` pytree) so the whole step is one pure jitted function; the
ring-buffer write is a static-shape ``dynamic_update_slice`` with wrap-around
handled by double-write.
"""

from typing import Any, Tuple

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp

from tmv_tpu.models.backbones.resnet_v2 import ResNet50V2
from tmv_tpu.models.layers.common import ConvBN, DarknetConv, upsample2x
from tmv_tpu.models.yolo_v3 import LastLayers
from tmv_tpu.ops.losses import moco_info_nce_loss


class ResNetYoloV3(nn.Module):
    """ResNet50V2 backbone + YOLOv3 neck/heads (3 scales).

    `momentum_contrast/model.py:39-99` / `unsupervised_learning/model.py:39-…`
    — identical head shape to YoloV3 but on keras-ResNet50V2 taps.
    """

    out_filters: int
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple:
        # remat: block-level rematerialization (see YoloV4.remat) — exact,
        # same variable tree, peak-HBM lever for large-batch pretraining
        Last = (nn.remat(LastLayers, static_argnums=(2,))
                if self.remat else LastLayers)
        y1, y2, y3 = ResNet50V2(self.dtype, remat=self.remat)(x, train)

        x, h1 = Last(512, self.dtype, name="LastLayers_0")(y1, train)
        h1 = DarknetConv(self.out_filters, 1, dtype=self.dtype)(h1)

        x = ConvBN(256, 1, act="leaky", dtype=self.dtype)(x, train)
        x = upsample2x(x)
        x = jnp.concatenate([x, y2], axis=-1)
        x, h2 = Last(256, self.dtype, name="LastLayers_1")(x, train)
        h2 = DarknetConv(self.out_filters, 1, dtype=self.dtype)(h2)

        x = ConvBN(128, 1, act="leaky", dtype=self.dtype)(x, train)
        x = upsample2x(x)
        x = jnp.concatenate([x, y3], axis=-1)
        x, h3 = Last(128, self.dtype, name="LastLayers_2")(x, train)
        h3 = DarknetConv(self.out_filters, 1, dtype=self.dtype)(h3)
        return h1, h2, h3


@flax.struct.dataclass
class MocoState:
    """MoCo-specific train-state extra: key tower + negative queue."""

    key_params: Any
    key_batch_stats: Any
    queue: jax.Array  # (K, C), l2-normalized rows
    queue_ptr: jax.Array  # scalar int32


def init_moco_state(key_variables, queue_size: int, feature_dim: int,
                    rng) -> MocoState:
    queue = jax.random.uniform(rng, (queue_size, feature_dim))
    queue = queue / jnp.linalg.norm(queue, axis=1, keepdims=True)
    return MocoState(
        key_params=key_variables["params"],
        key_batch_stats=key_variables["batch_stats"],
        queue=queue,
        queue_ptr=jnp.zeros((), jnp.int32),
    )


def push_queue(queue: jax.Array, ptr: jax.Array, items: jax.Array):
    """Ring-buffer enqueue (`momentum_contrast/model.py:305-314`)."""
    k = queue.shape[0]
    n = items.shape[0]
    idx = (ptr + jnp.arange(n)) % k
    queue = queue.at[idx].set(items)
    return queue, (ptr + n) % k


def flatten_normalize(heads) -> jax.Array:
    n = heads[0].shape[0]
    flat = jnp.concatenate([h.reshape(n, -1) for h in heads], axis=-1)
    return flat / jnp.linalg.norm(flat, axis=1, keepdims=True)


def make_moco_train_step(model: ResNetYoloV3, tx, temperature: float = 0.07,
                         momentum: float = 0.999,
                         momentum_warmup_steps: int = 1000):
    """Full MoCo step: InfoNCE grad on q, EMA update of k, queue push.

    The reference warms the momentum in (`model.py:383-388`); here the decay
    ramps as ``min(momentum, step / warmup)`` to the same effect.
    """

    def train_step(state, batch, rng):
        moco: MocoState = state.extra
        x_q, x_k = batch["query"], batch["key"]

        # key forward, no gradient, BN in inference mode (training=False
        # at model.py:359)
        y_k = model.apply(
            {"params": moco.key_params, "batch_stats": moco.key_batch_stats},
            x_k, train=False,
        )
        k_feat = jax.lax.stop_gradient(flatten_normalize(y_k))

        def loss_fn(params):
            y_q, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x_q, train=True, mutable=["batch_stats"],
            )
            loss = moco_info_nce_loss(y_q, y_k, moco.queue, temperature)
            return loss, mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        import optax

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        decay = jnp.minimum(
            momentum, state.step.astype(jnp.float32) / momentum_warmup_steps
        )
        new_key_params = jax.tree.map(
            lambda k_, q_: k_ * decay + q_ * (1 - decay),
            moco.key_params, new_params,
        )
        new_key_stats = jax.tree.map(
            lambda k_, q_: k_ * decay + q_ * (1 - decay),
            moco.key_batch_stats, new_stats,
        )
        queue, ptr = push_queue(moco.queue, moco.queue_ptr, k_feat)
        new_extra = MocoState(new_key_params, new_key_stats, queue, ptr)
        new_state = state.replace(
            params=new_params, batch_stats=new_stats, opt_state=new_opt,
            step=state.step + 1, extra=new_extra,
        )
        return new_state, {"loss": loss}

    return train_step
