"""Optimizer policy and LR plateau scheduling.

Feature-parity targets:

* Optimizer selection (reference ``src/train.py:321-330``): AdamW with
  weight_decay defaulting to 0.01 for ``cnn*`` models, plain Adam otherwise;
  any explicit ``weight_decay > 0`` forces AdamW.
* ``ReduceLROnPlateau`` (reference ``src/train.py:332-341``) with torch's
  exact semantics: mode=min, relative threshold (improvement means
  ``metric < best * (1 - threshold)``), patience counted in *bad epochs*,
  reduction ``lr = max(lr * factor, min_lr)``.

The learning rate is injected as an optax hyperparameter so the host-side
scheduler mutates it without recompiling the jit'd train step.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import optax


def build_optimizer(model_name: str, lr: float, weight_decay: float = 0.0) -> optax.GradientTransformation:
    """The reference's optimizer policy, with the LR exposed as a mutable
    hyperparameter for plateau scheduling."""
    wd = weight_decay
    if model_name.startswith("cnn") and wd == 0.0:
        wd = 0.01
    if wd > 0:
        return optax.inject_hyperparams(optax.adamw)(learning_rate=lr, weight_decay=wd)
    return optax.inject_hyperparams(optax.adam)(learning_rate=lr)


def get_lr(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


def set_lr(opt_state, lr: float):
    opt_state.hyperparams["learning_rate"] = np.asarray(lr, np.float32)
    return opt_state


@dataclasses.dataclass
class PlateauScheduler:
    """torch ``ReduceLROnPlateau`` (mode=min, threshold_mode=rel)."""

    factor: float = 0.5
    patience: int = 2
    threshold: float = 1e-4
    min_lr: float = 1e-6
    cooldown: int = 0

    best: float | None = None
    num_bad_epochs: int = 0
    cooldown_counter: int = 0

    def step(self, metric: float, lr: float) -> float:
        """Feed one epoch's monitored metric; returns the (possibly reduced) lr."""
        if self.best is None or metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0
        if self.num_bad_epochs > self.patience:
            lr = max(lr * self.factor, self.min_lr)
            self.cooldown_counter = self.cooldown
            self.num_bad_epochs = 0
        return lr

    def state_dict(self) -> dict:
        return {
            "factor": self.factor,
            "patience": self.patience,
            "threshold": self.threshold,
            "min_lr": self.min_lr,
            "cooldown": self.cooldown,
            "best": self.best,
            "num_bad_epochs": self.num_bad_epochs,
            "cooldown_counter": self.cooldown_counter,
        }

    @classmethod
    def from_state_dict(cls, d: dict) -> "PlateauScheduler":
        return cls(**d)


def smooth_labels(labels, label_smoothing: float):
    """``y*(1-eps) + 0.5*eps`` (reference ``src/train.py:311-320``)."""
    if label_smoothing <= 0:
        return labels
    return labels * (1.0 - label_smoothing) + 0.5 * label_smoothing
