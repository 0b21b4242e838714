"""Learning-rate schedules.

Parity surface: ``CosineLrSchedule`` (`efficientnet/train.py:35-63`) — linear
warmup from ``lr_warmup_init`` to ``adjusted_lr`` over ``lr_warmup_step``
steps, then ``0.5 * lr * (1 + cos(pi * step / decay_steps))``.  Note the
reference quirk: the cosine phase uses the *raw* step (not step − warmup),
replicated here.  Exposed as optax-compatible schedule callables.
"""

import math

import jax.numpy as jnp


def cosine_lr_schedule(
    adjusted_lr: float,
    lr_warmup_init: float,
    lr_warmup_step: int,
    total_steps: int,
):
    """The reference's cosine schedule with linear warmup."""
    decay_steps = float(total_steps - lr_warmup_step)

    def schedule(step):
        step_f = jnp.asarray(step, jnp.float32)
        linear = lr_warmup_init + step_f / lr_warmup_step * (
            adjusted_lr - lr_warmup_init
        )
        cosine = 0.5 * adjusted_lr * (1 + jnp.cos(math.pi * step_f / decay_steps))
        return jnp.where(step < lr_warmup_step, linear, cosine)

    return schedule


def scaled_lr(base_lr: float, batch_size: int, base_batch: int = 64) -> float:
    """Linear batch-size LR scaling (`efficientnet/train.py:106`)."""
    return base_lr * batch_size / base_batch


def shadow_loss_decay(step, loss_decay: float = 0.9):
    """EMA decay with warmup ramp (`yolo_v3/model.py:205-207`):
    ``min(loss_decay, (1 + step) / (1000 + step))``."""
    step_f = jnp.asarray(step, jnp.float32)
    return jnp.minimum(loss_decay, (1.0 + step_f) / (1000.0 + step_f))
