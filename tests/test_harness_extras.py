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


class TestGradAccum:
    def test_matches_full_batch_without_bn(self):
        """For a stats-free loss, mean-of-micro-grads == full-batch grad,
        so accumulated and direct steps must produce identical params."""
        def loss_fn(params, batch_stats, batch, rng):
            pred = batch["x"] @ params["w"]
            return jnp.mean((pred - batch["y"]) ** 2), (batch_stats, {})

        rng = np.random.default_rng(0)
        batch = {
            "x": jnp.asarray(rng.normal(size=(8, 5)).astype(np.float32)),
            "y": jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32)),
        }
        params = {"w": jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))}
        tx = optax.sgd(0.1)

        s_direct = TrainState.create(params, {}, tx)
        s_accum = TrainState.create(params, {}, tx)
        step_direct = jax.jit(make_train_step(loss_fn, tx))
        step_accum = jax.jit(make_train_step(loss_fn, tx, accum_steps=4))
        key = jax.random.key(0)
        s_direct, m_direct = step_direct(s_direct, batch, key)
        s_accum, m_accum = step_accum(s_accum, batch, key)

        np.testing.assert_allclose(np.asarray(s_direct.params["w"]),
                                   np.asarray(s_accum.params["w"]),
                                   rtol=1e-5, atol=1e-6)
        assert float(m_direct["loss"]) == pytest.approx(
            float(m_accum["loss"]), rel=1e-5)

    def test_bn_model_threads_stats_and_learns(self):
        from tmv_tpu.models.unet import UNetLogits, make_unet_loss_fn

        model = UNetLogits(depth=1, filters_base=2, output_filters=1)
        x = jnp.zeros((8, 16, 16, 3))
        variables = model.init(jax.random.key(0), x, train=False)
        tx = optax.sgd(0.5)
        state = TrainState.create(variables["params"],
                                  variables["batch_stats"], tx)
        loss_fn = make_unet_loss_fn(model)
        step = jax.jit(make_train_step(loss_fn, tx, accum_steps=2))
        rng = np.random.default_rng(1)
        batch = {
            "image": jnp.asarray(
                rng.uniform(size=(8, 16, 16, 3)).astype(np.float32)),
            "target": jnp.asarray((rng.uniform(size=(8, 16, 16, 1)) > 0.8)
                                  .astype(np.float32)),
        }
        losses = []
        for i in range(5):
            state, metrics = step(state, batch, jax.random.key(i))
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
        # BN stats must have moved from init (threaded through micro-steps)
        leaf = jax.tree_util.tree_leaves(state.batch_stats)[0]
        assert float(jnp.abs(leaf).sum()) > 0.0
