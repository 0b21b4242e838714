"""Breakdown of the D0 train-step cost (VERDICT r1 weak #5).

Measures, per batch size: eval forward, train-mode forward (BN batch
stats), and the full train step, all bf16.  Timing uses the slope method
(see ``bench.py``): k data-dependent chained executions inside one jit
with k a *traced* loop bound (single compile), host-fetch at the end,
difference two k values — the axon backend's ~30 ms RPC floor and
unreliable ``block_until_ready`` cancel out.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

K_SMALL, K_LARGE = 1, 5


def slope_time(run, reps=3):
    times = {}
    for k in (K_SMALL, K_LARGE):
        _ = run(k)  # warm/compile
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = run(k)
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    return (times[K_LARGE] - times[K_SMALL]) / (K_LARGE - K_SMALL)


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from tmv_tpu.models.efficientdet import (
        EfficientDetNet, get_efficientdet_config,
    )
    from tmv_tpu.models.efficientdet.net import make_efficientdet_loss_fn
    from tmv_tpu.core.train_state import TrainState, make_train_step
    from tmv_tpu.ops.anchors import Anchors

    cfg = get_efficientdet_config("efficientdet-d0")
    model = EfficientDetNet(config=cfg, dtype=jnp.bfloat16)
    size = cfg.image_size
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, size, size, 3)), train=False)
    anchors = Anchors(cfg.min_level, cfg.max_level, (size, size),
                      cfg.num_scales, cfg.aspect_ratios, cfg.anchor_scale)
    rng = np.random.default_rng(0)

    for batch in (8, 32):
        x = jnp.asarray(rng.uniform(size=(batch, size, size, 3))
                        .astype(np.float32))
        gt_b = jnp.tile(jnp.asarray([[[64., 64., 300., 300.]]]),
                        (batch, 1, 1))
        gt_c = jnp.ones((batch, 1), jnp.int32)
        bt, ct, mt = jax.vmap(
            lambda b, c: anchors.generate_targets(b, c, cfg.num_classes)
        )(gt_b, gt_c)
        batch_d = {"image": x, "boxes": bt, "classes": ct, "masks": mt}

        @jax.jit
        def eval_chain(v, img, k):
            def body(i, carry):
                boxes, _ = model.apply(v, carry, train=False)
                s = sum(jnp.sum(b.astype(jnp.float32)) for b in boxes)
                return carry + (s * 1e-12).astype(carry.dtype)
            out = jax.lax.fori_loop(0, k, body, img)
            return jnp.sum(out.astype(jnp.float32))

        @jax.jit
        def train_fwd_chain(v, img, k):
            def body(i, carry):
                (boxes, _), _ = model.apply(
                    v, carry, train=True, mutable=["batch_stats"],
                    rngs={"dropout": jax.random.key(0)})
                s = sum(jnp.sum(b.astype(jnp.float32)) for b in boxes)
                return carry + (s * 1e-12).astype(carry.dtype)
            out = jax.lax.fori_loop(0, k, body, img)
            return jnp.sum(out.astype(jnp.float32))

        loss_fn = make_efficientdet_loss_fn(model)
        tx = optax.sgd(1e-3, momentum=0.9)
        state0 = TrainState.create(variables["params"],
                                   variables["batch_stats"], tx)
        train_step = make_train_step(loss_fn, tx, clip_global_norm=10.0)

        @jax.jit
        def step_chain(st, b, k):
            def body(i, carry):
                st2, _ = train_step(carry, b, jax.random.key(0))
                return st2
            out = jax.lax.fori_loop(0, k, body, st)
            return jnp.sum(
                jax.tree_util.tree_leaves(out.params)[0].astype(jnp.float32))

        t_eval = slope_time(
            lambda k: np.asarray(eval_chain(variables, x, k)))
        t_tfwd = slope_time(
            lambda k: np.asarray(train_fwd_chain(variables, x, k)))
        t_step = slope_time(
            lambda k: np.asarray(step_chain(state0, batch_d, k)))
        print(f"b{batch}: eval_fwd {t_eval*1e3:.2f} ms ({batch/t_eval:.0f} i/s)"
              f" | train_fwd {t_tfwd*1e3:.2f} ms ({batch/t_tfwd:.0f} i/s)"
              f" | train_step {t_step*1e3:.2f} ms ({batch/t_step:.0f} i/s)",
              flush=True)


if __name__ == "__main__":
    main()
