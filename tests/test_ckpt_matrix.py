"""Checkpoint-compat matrix (round-3 item 10): a checkpoint written under
any flag combination — remat x {dp, sp, tp, fsdp} placement — must restore
into the PLAIN (unsharded, no-remat) model byte-identically.

Two invariants make this true by construction, pinned here explicitly:
  1. ``remat`` never changes the variable tree (explicit module names pin
     the direct autonames — backbone.py / yolo_v4.py docstrings);
  2. orbax saves the *logical* array regardless of device placement, so a
     TP/FSDP-sharded (or dp/sp-replicated) state restores into a plain
     single-device template.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from tmv_tpu.core.config import Config
from tmv_tpu.core.checkpoint import CheckpointManager
from tmv_tpu.core.train_state import TrainState
from tmv_tpu.models.efficientdet import (
    EfficientDetNet, get_efficientdet_config,
)
from tmv_tpu.parallel.fsdp import FullyShardedDataParallel
from tmv_tpu.parallel.spatial import SpatialDataParallel
from tmv_tpu.parallel.tensor import TensorParallel
from tmv_tpu.parallel.train import DataParallel


def _tiny_cfg(remat: bool) -> Config:
    cfg = get_efficientdet_config("efficientdet-d0")
    cfg.image_size = 32
    cfg.num_classes = 2
    cfg.levels_size = [32]
    for _ in range(cfg.max_level):
        cfg.levels_size.append((cfg.levels_size[-1] + 1) // 2)
    cfg.remat = remat
    return cfg


@pytest.fixture(scope="module")
def trained_state():
    """A remat=True model's state with distinguishable content.

    A checkpoint's bytes depend only on the state values, not on whether
    an optimizer step produced them — so instead of compiling a full
    train step (minutes on 1 CPU) every leaf is given a deterministic
    per-leaf perturbation.  The real remat train step itself is covered
    by the slow-tier EfficientDet e2e tests."""
    cfg = _tiny_cfg(remat=True)
    model = EfficientDetNet(config=cfg)
    x = jnp.zeros((8, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    tx = optax.adam(1e-3)
    state = TrainState.create(variables["params"],
                              variables["batch_stats"], tx)

    counter = iter(range(1, 10**6))

    def perturb(leaf):
        i = next(counter)
        if not hasattr(leaf, "dtype") or not jnp.issubdtype(
                leaf.dtype, jnp.floating):
            return leaf
        return leaf + jnp.asarray(0.001 * i, leaf.dtype)

    s1 = jax.tree.map(perturb, state)
    s1 = s1.replace(step=jnp.asarray(1, jnp.int32))
    return s1, state


def _assert_states_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = jax.tree_util.tree_leaves_with_path(b)
    assert len(la) == len(lb)
    for (pa, va), (_, vb) in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb),
                                      err_msg=str(pa))


class TestCheckpointCompatMatrix:
    def test_remat_flag_never_changes_variable_tree(self):
        x = jnp.zeros((1, 32, 32, 3), jnp.float32)
        v_plain = EfficientDetNet(config=_tiny_cfg(False)).init(
            jax.random.key(0), x, train=False)
        v_remat = EfficientDetNet(config=_tiny_cfg(True)).init(
            jax.random.key(0), x, train=False)
        assert (jax.tree_util.tree_structure(v_plain)
                == jax.tree_util.tree_structure(v_remat))
        for (p, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(v_plain),
                jax.tree_util.tree_leaves_with_path(v_remat)):
            assert a.shape == b.shape and a.dtype == b.dtype, p
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=str(p))

    @pytest.mark.parametrize("mode", ["plain", "dp", "sp", "tp", "fsdp"])
    def test_placed_state_checkpoint_restores_into_plain_model(
            self, trained_state, tmp_path, mode):
        """Save FROM the mode-placed (sharded/replicated) state produced
        under remat=True; restore into the plain single-device template —
        byte-identical, regardless of placement."""
        s1, template = trained_state
        if mode == "plain":
            placed = s1
        elif mode == "dp":
            placed = DataParallel(8).put_state(s1)
        elif mode == "sp":
            placed = SpatialDataParallel(data=4, space=2).put_state(s1)
        elif mode == "tp":
            placed = TensorParallel(data=4, model=2,
                                    min_channels=2).put_state(s1)
        else:
            placed = FullyShardedDataParallel(8, min_size=64).put_state(s1)

        mgr = CheckpointManager(str(tmp_path / f"ckpt_{mode}"))
        mgr.save(int(jax.device_get(placed.step)), placed, force=True)
        restored = mgr.restore(template)
        mgr.close()
        _assert_states_equal(placed, restored)

    def test_restored_state_runs_in_plain_noremat_model(
            self, trained_state, tmp_path):
        """End of the matrix: TP-sharded remat=True checkpoint → restore →
        forward through the remat=False model produces finite outputs."""
        s1, template = trained_state
        placed = TensorParallel(data=4, model=2,
                                min_channels=2).put_state(s1)
        mgr = CheckpointManager(str(tmp_path / "ckpt_cross"))
        mgr.save(int(jax.device_get(placed.step)), placed, force=True)
        restored = mgr.restore(template)
        mgr.close()

        model = EfficientDetNet(config=_tiny_cfg(False))
        x = jnp.asarray(np.random.default_rng(3).uniform(
            size=(1, 32, 32, 3)).astype(np.float32))
        boxes, classes = model.apply(
            {"params": restored.params,
             "batch_stats": restored.batch_stats}, x, train=False)
        for o in list(boxes) + list(classes):
            assert bool(jnp.all(jnp.isfinite(o)))
