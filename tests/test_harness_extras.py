import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from tmv_tpu.core.train_state import (
    TrainState, make_line_search_train_step, make_train_step,
)
from tmv_tpu.models.detector_harness import freeze_mask, masked_optimizer
from tmv_tpu.parallel.train import DataParallel


class TestLineSearchStep:
    def test_quadratic_converges(self):
        # loss = 0.5 * ||w - 3||²; line search must reduce it
        def loss_fn(params, batch_stats, batch, rng):
            return 0.5 * jnp.sum((params["w"] - 3.0) ** 2), (batch_stats, {})

        params = {"w": jnp.zeros((4,))}
        state = TrainState.create(params, {}, optax.sgd(1.0))
        step = jax.jit(make_line_search_train_step(loss_fn, init_lr=0.5))
        for i in range(5):
            state, metrics = step(state, None, jax.random.key(i))
        assert float(metrics["new_loss"]) < float(metrics["loss"])
        # several steps later, much closer to the optimum
        assert float(jnp.abs(state.params["w"] - 3.0).max()) < 2.0

    def test_shrinks_lr_on_overshoot(self):
        # steep quadratic: lr=0.05 overshoots when curvature is huge
        def loss_fn(params, batch_stats, batch, rng):
            return 1000.0 * jnp.sum(params["w"] ** 2), (batch_stats, {})

        params = {"w": jnp.ones((1,))}
        state = TrainState.create(params, {}, optax.sgd(1.0))
        step = jax.jit(make_line_search_train_step(loss_fn, init_lr=0.05))
        new_state, metrics = step(state, None, jax.random.key(0))
        assert float(metrics["new_loss"]) < float(metrics["loss"])


class TestFreezeMask:
    def test_masked_optimizer_freezes(self):
        params = {"backbone": {"kernel": jnp.ones((2,))},
                  "head": {"kernel": jnp.ones((2,))}}
        mask = freeze_mask(params, ["head"])
        assert mask == {"backbone": {"kernel": False},
                        "head": {"kernel": True}}

        def loss_fn(params, batch_stats, batch, rng):
            return (jnp.sum(params["backbone"]["kernel"] ** 2)
                    + jnp.sum(params["head"]["kernel"] ** 2)), (batch_stats, {})

        tx = masked_optimizer(optax.sgd(0.1), mask)
        state = TrainState.create(params, {}, tx)
        step = jax.jit(make_train_step(loss_fn, tx))
        new_state, _ = step(state, None, jax.random.key(0))
        np.testing.assert_array_equal(
            np.asarray(new_state.params["backbone"]["kernel"]),
            np.asarray(params["backbone"]["kernel"]))
        assert not np.allclose(
            np.asarray(new_state.params["head"]["kernel"]),
            np.asarray(params["head"]["kernel"]))


class TestDataParallelWrapper:
    def test_wrap_step_runs(self):
        def loss_fn(params, batch_stats, batch, rng):
            pred = batch["x"] @ params["w"]
            return jnp.mean((pred - batch["y"]) ** 2), (batch_stats, {})

        tx = optax.sgd(0.1)
        params = {"w": jnp.zeros((4, 1))}
        state = TrainState.create(params, {}, tx)
        dp = DataParallel()
        assert dp.num_devices == 8
        step = dp.wrap_step(make_train_step(loss_fn, tx))
        rng = np.random.default_rng(0)
        batch = {
            "x": jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32)),
            "y": jnp.asarray(rng.normal(size=(16, 1)).astype(np.float32)),
        }
        state = dp.put_state(state)
        batch = dp.put_batch(batch)
        new_state, metrics = step(state, batch, dp.put_rng(jax.random.key(0)))
        assert np.isfinite(float(metrics["loss"]))
