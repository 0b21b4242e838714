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
