"""Breakdown of the D0 train-step cost (VERDICT r1 weak #5).

Measures, per batch size: eval forward, train-mode forward (BN batch
stats), and the full train step, all bf16.  Timing: async-dispatch N
dependent iterations (state/image carry the data dependency) and
host-fetch once at the end — dispatch overlaps compute, so wall/N is the
per-iteration device time without compiling a chained-loop program.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


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

    def timed_loop(run_once, init_carry, n=30):
        carry = run_once(init_carry)  # compile
        _ = jax.block_until_ready(carry)
        carry = init_carry
        t0 = time.perf_counter()
        for _ in range(n):
            carry = run_once(carry)
        # host fetch = true sync on axon
        leaf = jax.tree_util.tree_leaves(carry)[0]
        _ = np.asarray(leaf.astype(jnp.float32) if hasattr(leaf, "astype")
                       else leaf)
        return (time.perf_counter() - t0) / n

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
        def eval_once(v, img):
            boxes, _ = model.apply(v, img, train=False)
            s = sum(jnp.sum(b.astype(jnp.float32)) for b in boxes)
            return img + (s * 1e-12).astype(img.dtype)

        @jax.jit
        def train_fwd_once(v, img):
            (boxes, _), _ = model.apply(
                v, img, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.key(0)})
            s = sum(jnp.sum(b.astype(jnp.float32)) for b in boxes)
            return img + (s * 1e-12).astype(img.dtype)

        loss_fn = make_efficientdet_loss_fn(model)
        tx = optax.sgd(1e-3, momentum=0.9)
        state0 = TrainState.create(variables["params"],
                                   variables["batch_stats"], tx)
        train_step = make_train_step(loss_fn, tx, clip_global_norm=10.0)

        @jax.jit
        def step_once(st, b):
            st2, _ = train_step(st, b, jax.random.key(0))
            return st2

        t_eval = timed_loop(lambda img: eval_once(variables, img), x)
        t_tfwd = timed_loop(lambda img: train_fwd_once(variables, img), x)
        t_step = timed_loop(lambda st: step_once(st, batch_d), state0, n=20)
        print(f"b{batch}: eval_fwd {t_eval*1e3:.2f} ms ({batch/t_eval:.0f} i/s)"
              f" | train_fwd {t_tfwd*1e3:.2f} ms ({batch/t_tfwd:.0f} i/s)"
              f" | train_step {t_step*1e3:.2f} ms ({batch/t_step:.0f} i/s)",
              flush=True)


if __name__ == "__main__":
    main()
