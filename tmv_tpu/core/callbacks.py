"""Training-health callbacks: early stopping and LR-on-plateau reduction.

Parity surface: the Keras callbacks every reference trainer wires up —
``EarlyStopping(patience=10)`` and
``ReduceLROnPlateau(factor=0.3, patience=6, min_lr=1e-6)``
(`yolo_v3/train.py:74-77`, `efficientnet/train.py:138-141`).  Functional
re-design: plain-Python monitors driven from the CLI loop; the LR scaler
feeds an ``optax.scale_by`` factor threaded through ``inject_hyperparams``
or a schedule multiplier.
"""

from typing import Optional


def set_learning_rate(state, lr: float):
    """Thread a plateau-adjusted LR into a live ``TrainState``.

    Works with optimizers built via ``optax.inject_hyperparams`` (the CLIs
    use ``inject_hyperparams(optax.adam)(learning_rate=…)``): replaces the
    ``learning_rate`` entry in every ``InjectHyperparamsState`` found in
    ``state.opt_state``.  Pure pytree surgery — same structure/shape/dtype,
    so the already-jitted train step needs no recompile.
    """
    import jax.numpy as jnp
    import optax

    inject_types = (optax.InjectHyperparamsState,
                    optax.InjectStatefulHyperparamsState)
    found = []

    def rec(s):
        if isinstance(s, inject_types):
            hp = dict(s.hyperparams)
            if "learning_rate" in hp:
                hp["learning_rate"] = jnp.asarray(
                    lr, jnp.asarray(hp["learning_rate"]).dtype)
                found.append(True)
            return s._replace(hyperparams=hp)
        if isinstance(s, tuple):
            vals = [rec(x) for x in s]
            return type(s)(*vals) if hasattr(s, "_fields") else tuple(vals)
        return s

    new_opt_state = rec(state.opt_state)
    if not found:
        raise ValueError(
            "no InjectHyperparamsState with a learning_rate in opt_state — "
            "build the optimizer with optax.inject_hyperparams")
    return state.replace(opt_state=new_opt_state)


class EarlyStopping:
    """Stop when the monitored value hasn't improved for ``patience`` epochs."""

    def __init__(self, patience: int = 10, min_delta: float = 0.0,
                 mode: str = "min"):
        self.patience = patience
        self.min_delta = min_delta
        self.sign = 1.0 if mode == "min" else -1.0
        self.best: Optional[float] = None
        self.wait = 0
        self.stopped = False

    def update(self, value: float) -> bool:
        """Returns True when training should stop."""
        v = self.sign * float(value)
        if self.best is None or v < self.best - self.min_delta:
            self.best = v
            self.wait = 0
        else:
            self.wait += 1
            if self.wait >= self.patience:
                self.stopped = True
        return self.stopped


class ReduceLROnPlateau:
    """Multiply an LR factor by ``factor`` after ``patience`` flat epochs."""

    def __init__(self, factor: float = 0.3, patience: int = 6,
                 min_delta: float = 0.0, min_lr: float = 1e-6,
                 base_lr: float = 1.0, mode: str = "min"):
        self.factor = factor
        self.patience = patience
        self.min_delta = min_delta
        self.min_lr = min_lr
        self.base_lr = base_lr
        self.sign = 1.0 if mode == "min" else -1.0
        self.best: Optional[float] = None
        self.wait = 0
        self.scale = 1.0

    @property
    def lr(self) -> float:
        return max(self.base_lr * self.scale, self.min_lr)

    def update(self, value: float) -> float:
        """Feed the epoch metric; returns the current LR."""
        v = self.sign * float(value)
        if self.best is None or v < self.best - self.min_delta:
            self.best = v
            self.wait = 0
        else:
            self.wait += 1
            if self.wait >= self.patience:
                if self.lr > self.min_lr:
                    self.scale *= self.factor
                self.wait = 0
        return self.lr


class GracefulShutdown:
    """Preemption-safe training: catch SIGTERM/SIGINT, finish the current
    step, checkpoint, exit cleanly.

    TPU fleet schedulers preempt with SIGTERM; the reference's only
    recovery story is restart-and-resume from the last epoch checkpoint
    (`yolo_v3/train.py:60-70`) — up to an epoch of work lost.  Installing
    this in the CLI loop caps the loss at one step: the handler only sets
    a flag (async-signal-safe), the loop polls ``requested`` at the step
    boundary and performs the save itself.  The second signal restores the
    previous handler, so a stuck save can still be killed.
    """

    def __init__(self, signals=None):
        import signal as _signal

        self._signal = _signal
        self.requested = False
        self._prev = {}
        for sig in signals or (_signal.SIGTERM, _signal.SIGINT):
            try:
                self._prev[sig] = _signal.signal(sig, self._handle)
            except (ValueError, OSError):  # non-main thread / unsupported
                pass

    def _handle(self, sig, frame):
        self.requested = True
        # second signal falls through to the original behavior
        if sig in self._prev:
            self._signal.signal(sig, self._prev[sig])

    def uninstall(self):
        for sig, prev in self._prev.items():
            try:
                self._signal.signal(sig, prev)
            except (ValueError, OSError):
                pass
        self._prev = {}
