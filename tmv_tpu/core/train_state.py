"""Train state and step factories for the whole zoo.

Replaces the reference's Keras ``Model.fit`` + custom ``train_step`` harness
(`yolo_v3/model.py:188-227`, `efficientnet/efficientdet_net_train.py:112-133`)
with an explicit functional state pytree driven by jitted steps:

- ``TrainState``: params / batch_stats (BN moments) / optimizer state / step,
  plus the reference's two EMA mechanisms — the *shadow loss* scalar
  (`yolo_v3/model.py:205-210`: gradients are effectively scaled by
  ``1 − decay`` because the EMA-blended loss only backprops through the live
  term) and optional *shadow params* (weight EMA: tfa ``MovingAverage`` at
  `efficientnet/train.py:118-120`, manual shadow model at
  `facenet/facenet_model.py:304-312`).
- ``make_train_step``: grad + optax update + BN-state threading, with
  optional global-norm clipping (``clip_by_global_norm(10)`` semantics at
  `efficientdet_net_train.py:125-131`) — built once, jitted by the caller or
  wrapped in ``shard_map`` by ``tmv_tpu.parallel``.
"""

from typing import Any, Callable, Optional

import flax
import jax
import jax.numpy as jnp
import optax

from tmv_tpu.core.schedules import shadow_loss_decay


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array
    shadow_loss: jax.Array
    ema_params: Optional[Any] = None
    ema_batch_stats: Optional[Any] = None
    extra: Optional[Any] = None  # model-specific (MoCo queue, key params, …)

    @classmethod
    def create(cls, params, batch_stats, tx: optax.GradientTransformation,
               ema_decay: Optional[float] = None, extra=None,
               ema_batch_stats: bool = False):
        """``ema_batch_stats=True`` also shadows BN moments — the FaceNet
        shadow model EMAs *all* variables (`facenet_model.py:304-312`)."""
        # model.init under nn.remat can yield JAX *literal* leaves
        # (TypedNdArray) for constant-initialized params; coerce to
        # committed device arrays so orbax checkpointing and jit aliasing
        # see uniform jax.Array leaves
        params = jax.tree.map(jnp.asarray, params)
        batch_stats = jax.tree.map(jnp.asarray, batch_stats)
        if extra is not None:
            extra = jax.tree.map(jnp.asarray, extra)
        state = cls(
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
            shadow_loss=jnp.zeros((), jnp.float32),
            ema_params=jax.tree.map(jnp.array, params) if ema_decay else None,
            ema_batch_stats=(jax.tree.map(jnp.array, batch_stats)
                             if ema_decay and ema_batch_stats else None),
            extra=extra,
        )
        return state


def make_line_search_train_step(
    loss_fn: Callable,
    init_lr: float = 0.05,
    shrink: float = 0.3,
    min_lr: float = 1e-6,
    clip_global_norm: float = 10.0,
):
    """Line-search ("dynamic learning rate") train step.

    Parity surface: the experimental ``train_step_fast``
    (`efficientdet_net_train.py:60-110`, off by default in the reference):
    starting from lr=0.05, apply the clipped gradient, re-evaluate the
    loss, and shrink the lr by 0.3 until the loss improves (or lr hits
    ``min_lr``); the last tried weights are kept.  Implemented as a pure
    ``lax.while_loop`` over the parameter pytree with plain SGD updates
    (the reference mutated its stateful optimizer's lr in place — momentum
    side-effects there were incidental, not intent).
    """

    def train_step(state: TrainState, batch, rng):
        def raw_loss(params):
            loss, (new_stats, aux) = loss_fn(params, state.batch_stats,
                                             batch, rng)
            return loss, (new_stats, aux)

        (loss0, (new_stats, aux)), grads = jax.value_and_grad(
            raw_loss, has_aux=True)(state.params)
        gnorm = optax.global_norm(grads)
        scale = jnp.minimum(1.0, clip_global_norm / (gnorm + 1e-12))
        grads = jax.tree.map(lambda g: g * scale, grads)

        def eval_loss(params):
            loss, _ = loss_fn(params, state.batch_stats, batch, rng)
            return loss

        def try_lr(lr):
            cand = jax.tree.map(lambda p, g: p - lr * g, state.params, grads)
            return cand, eval_loss(cand)

        first_cand, first_loss = try_lr(jnp.asarray(init_lr))

        def cond(carry):
            lr, cand, new_loss = carry
            return jnp.logical_and(loss0 <= new_loss, lr > min_lr)

        def body(carry):
            lr, cand, new_loss = carry
            next_lr = lr * shrink
            next_cand, next_loss = try_lr(next_lr)
            return (next_lr, next_cand, next_loss)

        _, final_params, final_loss = jax.lax.while_loop(
            cond, body, (jnp.asarray(init_lr), first_cand, first_loss))

        new_state = state.replace(
            params=final_params,
            batch_stats=new_stats,
            step=state.step + 1,
        )
        return new_state, {"loss": loss0, "new_loss": final_loss,
                           "gnorm": gnorm, **aux}

    return train_step


def make_train_step(
    loss_fn: Callable,
    tx: optax.GradientTransformation,
    clip_global_norm: Optional[float] = None,
    shadow_loss: bool = False,
    loss_decay: float = 0.9,
    ema_decay: Optional[float] = None,
    accum_steps: int = 1,
):
    """Build a pure train step ``(state, batch, rng) -> (state, metrics)``.

    Args:
        loss_fn: ``(params, batch_stats, batch, rng) ->
            (loss, (new_batch_stats, aux_metrics))``.
        clip_global_norm: optional global-norm gradient clip.
        shadow_loss: enable the YOLO-family loss-EMA gradient damping
            (`yolo_v3/model.py:205-210`): after the warmup ramp the effective
            gradient is scaled by ``1 − decay``.
        ema_decay: optional weight-EMA decay (tfa MovingAverage parity).
        accum_steps: gradient accumulation — split the batch into this many
            micro-batches (leading dim must divide), ``lax.scan`` the grads
            and average before one optimizer update.  Trades step latency
            for HBM: activations only materialize for one micro-batch at a
            time, so effective batch sizes can exceed device memory.  BN
            statistics thread through the micro-batches sequentially.  No
            reference counterpart (a new capability).
    """

    def _grads_direct(params, batch_stats, batch, rng):
        def raw_loss(p):
            loss, (new_stats, aux) = loss_fn(p, batch_stats, batch, rng)
            return loss, (new_stats, aux)

        (loss, (new_stats, aux)), grads = jax.value_and_grad(
            raw_loss, has_aux=True)(params)
        return loss, new_stats, aux, grads

    def _grads_accum(params, batch_stats, batch, rng):
        micro = jax.tree.map(
            lambda x: x.reshape((accum_steps, x.shape[0] // accum_steps)
                                + x.shape[1:]), batch)
        rngs = jax.random.split(rng, accum_steps)

        def body(carry, xs):
            stats = carry
            mb, r = xs
            loss, stats, aux, grads = _grads_direct(params, stats, mb, r)
            return stats, (loss, aux, grads)

        final_stats, (losses, auxs, grads) = jax.lax.scan(
            body, batch_stats, (micro, rngs))
        mean = lambda t: jax.tree.map(lambda x: jnp.mean(x, axis=0), t)
        return (jnp.mean(losses), final_stats, mean(auxs), mean(grads))

    def train_step(state: TrainState, batch, rng):
        if accum_steps > 1:
            loss, new_stats, aux, grads = _grads_accum(
                state.params, state.batch_stats, batch, rng)
        else:
            loss, new_stats, aux, grads = _grads_direct(
                state.params, state.batch_stats, batch, rng)

        if shadow_loss:
            decay = shadow_loss_decay(state.step, loss_decay)
            # step > 1 gate as in the reference (optimizer.iterations > 1)
            use = (state.step > 1).astype(jnp.float32)
            scale = use * (1.0 - decay) + (1.0 - use)
            grads = jax.tree.map(lambda g: g * scale, grads)
            blended = scale * loss + use * decay * state.shadow_loss
            new_shadow = blended
            loss_report = blended
        else:
            new_shadow = state.shadow_loss
            loss_report = loss

        metrics = {"loss": loss_report, "raw_loss": loss, **aux}
        if clip_global_norm is not None:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, clip_global_norm / (gnorm + 1e-12))
            grads = jax.tree.map(lambda g: g * scale, grads)
            metrics["gnorm"] = gnorm

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        new_ema = state.ema_params
        new_ema_stats = state.ema_batch_stats
        if ema_decay is not None and state.ema_params is not None:
            new_ema = jax.tree.map(
                lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                state.ema_params, new_params,
            )
            if state.ema_batch_stats is not None:
                new_ema_stats = jax.tree.map(
                    lambda e, s: e * ema_decay + s * (1.0 - ema_decay),
                    state.ema_batch_stats, new_stats,
                )

        new_state = state.replace(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            step=state.step + 1,
            shadow_loss=new_shadow,
            ema_params=new_ema,
            ema_batch_stats=new_ema_stats,
        )
        return new_state, metrics

    return train_step
