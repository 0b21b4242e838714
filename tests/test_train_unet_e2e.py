"""Minimum end-to-end slice: UNet heatmap training (SURVEY §7 stage 4).

Proves core substrate (train state, schedules, grad clip, checkpoint/resume)
+ ops (soft labels, BCE) + model together, on tiny shapes."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from tmv_tpu.core.checkpoint import CheckpointManager
from tmv_tpu.core.train_state import TrainState, make_train_step
from tmv_tpu.models.unet import UNetLogits, make_unet_loss_fn
from tmv_tpu.ops.soft_label import SoftLabel


@pytest.fixture(scope="module")
def setup():
    model = UNetLogits(depth=2, filters_base=4, output_filters=2)
    x = jnp.zeros((2, 32, 32, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    tx = optax.adam(1e-3)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    loss_fn = make_unet_loss_fn(model)
    step = jax.jit(make_train_step(loss_fn, tx, clip_global_norm=10.0))
    sl = SoftLabel(image_size=(32, 32), points_num=2, kernel_size=(7, 7))
    tgt = sl.get_target(jnp.asarray(np.array([[8, 8], [20, 20]], np.int32)))
    batch = {
        "image": jnp.asarray(
            np.random.default_rng(0).uniform(size=(2, 32, 32, 3)).astype(np.float32)),
        "target": jnp.tile(tgt[None], (2, 1, 1, 1)),
    }
    return model, state, step, batch


class TestUnetTraining:
    def test_loss_decreases(self, setup):
        model, state, step, batch = setup
        losses = []
        for i in range(30):
            state, metrics = step(state, batch, jax.random.key(i))
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
        assert int(state.step) == 30

    def test_checkpoint_roundtrip(self, setup, tmp_path):
        model, state, step, batch = setup
        state, _ = step(state, batch, jax.random.key(0))
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save(int(state.step), state)
        assert mgr.latest_step() == 1
        template = jax.tree.map(np.zeros_like, state)
        restored = mgr.restore(template)
        leaves_a = jax.tree_util.tree_leaves(state.params)
        leaves_b = jax.tree_util.tree_leaves(restored.params)
        for a, b in zip(leaves_a, leaves_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(restored.step) == int(state.step)
        mgr.close()

    def test_async_save_overlaps_and_drains(self, setup, tmp_path):
        """Per-epoch saves run async (wait=False) so serialization
        overlaps the next epoch; the final force-save (or a dedup'd one)
        must drain every pending write before the process exits."""
        model, state, step, batch = setup
        mgr = CheckpointManager(str(tmp_path / "ckpt_async"))
        for i in range(3):
            state, _ = step(state, batch, jax.random.key(i))
            mgr.save(int(state.step), state, wait=False)
        # final save of the SAME step dedups but still drains the queue
        mgr.save(int(state.step), state, force=True)
        assert mgr.latest_step() == int(state.step)
        restored = mgr.restore(jax.tree.map(np.zeros_like, state))
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        mgr.close()

    def test_restore_weights_across_optimizers(self, setup, tmp_path):
        """Inference CLIs restore with a dummy SGD template against
        whatever optimizer the trainer used — restore_weights must graft
        params/batch_stats/step and ignore the opt_state mismatch
        (caught live by tools/e2e_production_loop.py)."""
        import optax

        model, state, step, batch = setup
        state, _ = step(state, batch, jax.random.key(0))  # adam state
        mgr = CheckpointManager(str(tmp_path / "ckpt_x"))
        mgr.save(int(state.step), state)

        template = TrainState.create(
            jax.tree.map(np.zeros_like, state.params),
            jax.tree.map(np.zeros_like, state.batch_stats),
            optax.sgd(1e-3))
        restored = mgr.restore_weights(template)
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(state.batch_stats),
                        jax.tree_util.tree_leaves(restored.batch_stats)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(restored.step) == int(state.step)
        mgr.close()

    def test_grad_clip_reported(self, setup):
        model, state, step, batch = setup
        _, metrics = step(state, batch, jax.random.key(0))
        assert "gnorm" in metrics and np.isfinite(float(metrics["gnorm"]))


class TestShadowLossStep:
    def test_shadow_damping(self):
        # gradient scale becomes (1 - decay) after warmup
        def loss_fn(params, batch_stats, batch, rng):
            return jnp.sum(params["w"] * batch), (batch_stats, {})

        tx = optax.sgd(1.0)
        params = {"w": jnp.ones(())}
        state = TrainState.create(params, {}, tx)
        step = jax.jit(make_train_step(loss_fn, tx, shadow_loss=True))
        b = jnp.asarray(1.0)
        # steps 0,1: full gradient (reference gates on iterations > 1)
        state1, m1 = step(state, b, jax.random.key(0))
        assert float(state.params["w"] - state1.params["w"]) == pytest.approx(1.0)
        state2, _ = step(state1, b, jax.random.key(0))
        # step 2: decay = min(.9, 3/1002) → grad scale 1-decay
        state3, _ = step(state2, b, jax.random.key(0))
        expected = 1.0 - min(0.9, (1 + 2) / (1000 + 2))
        assert float(state2.params["w"] - state3.params["w"]) == pytest.approx(
            expected, rel=1e-5)
