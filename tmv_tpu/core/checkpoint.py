"""Checkpoint save/restore with latest-step resume (orbax-backed).

Capability parity with the reference's three checkpoint mechanisms
(`SURVEY.md` §5): Keras ``ModelCheckpoint`` / ``SaveCallback``
(`callbacks/save.py:10-14`) and the ``tf.train.latest_checkpoint`` resume
probe each trainer performs (`yolo_v3/train.py:60-70`), where
``initial_epoch`` is derived from the optimizer iteration count.  Here the
step lives in the ``TrainState`` pytree so resume is exact.
"""

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin orbax wrapper: numbered step checkpoints + latest restore."""

    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )
        self._last_saved_step: Optional[int] = None

    def save(self, step: int, state: Any, force: bool = False,
             wait: bool = True):
        """Save ``state`` at ``step``.

        ``wait=False`` makes the save asynchronous (orbax copies arrays to
        host synchronously, the disk write proceeds in the background) so
        per-epoch saves overlap the next epoch's training instead of
        stalling the step loop; orbax serializes overlapping saves
        internally, and ``wait_until_finished``/``close`` drain the queue.
        """
        if not (step == self._last_saved_step
                or step in (self._mgr.all_steps() or ())):
            self._mgr.save(
                step, args=ocp.args.StandardSave(state), force=force
            )
            self._last_saved_step = step
        # dedup (e.g. final force-save right after the per-epoch save when
        # early stopping broke the loop) still drains pending async saves
        if wait:
            self._mgr.wait_until_finished()

    def wait_until_finished(self):
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure of ``state_template`` (abstract or
        concrete pytree). Returns the template unchanged when no checkpoint
        exists (fresh start)."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return state_template
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )

    def restore_weights(self, state_template: Any,
                        step: Optional[int] = None) -> Any:
        """Restore params/batch_stats/step (+EMA if saved) into the
        template, ignoring the optimizer state entirely.

        Inference CLIs (eval/export/serve/detect) build a dummy optimizer
        whose state structure need not match whatever the trainer used —
        a structural ``restore`` would fail on e.g. SGD-template vs
        Adam-checkpoint.  This reads the raw checkpoint tree instead and
        grafts only the weight-bearing fields."""
        import jax.numpy as jnp

        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return state_template
        raw = self._mgr.restore(step)
        get = raw.get if isinstance(raw, dict) else (lambda *_: None)
        out = state_template.replace(
            params=raw["params"],
            batch_stats=raw["batch_stats"],
            step=jnp.asarray(raw["step"]),
        )
        if get("shadow_loss") is not None:
            out = out.replace(shadow_loss=jnp.asarray(raw["shadow_loss"]))
        if get("ema_params") is not None:
            out = out.replace(ema_params=raw["ema_params"])
        if get("ema_batch_stats") is not None:
            out = out.replace(ema_batch_stats=raw["ema_batch_stats"])
        return out

    def close(self):
        self._mgr.close()
