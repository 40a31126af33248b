"""Checkpointing + early stopping.

Mirrors the reference EarlyStopping (EGNO/utils.py:229-278): save params on
every val-loss improvement, stop after `patience` evaluations without one.
Serialization uses flax msgpack bytes (the orbax-free fast path for these
tiny models); paths encode the full config like main.py:87.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
from flax import serialization


def save_params(path, params):
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def load_params(path, like):
    """Restore params with the same pytree structure as `like`."""
    with open(path, "rb") as f:
        return serialization.from_bytes(like, f.read())


class EarlyStopping:
    def __init__(self, patience=7, verbose=False, delta=0.0,
                 path="checkpoint.ckpt", trace_func=print):
        self.patience = patience
        self.verbose = verbose
        self.counter = 0
        self.best_score = None
        self.early_stop = False
        self.val_loss_min = np.inf
        self.delta = delta
        self.path = path
        self.trace_func = trace_func

    def __call__(self, val_loss, params, master_worker=True):
        score = -val_loss
        if self.best_score is None:
            self.best_score = score
            self.save_checkpoint(val_loss, params, master_worker)
        elif score < self.best_score + self.delta:
            self.counter += 1
            self.trace_func(
                f"EarlyStopping counter: {self.counter} out of {self.patience}")
            if self.counter >= self.patience:
                self.early_stop = True
        else:
            self.best_score = score
            self.save_checkpoint(val_loss, params, master_worker)
            self.counter = 0

    def save_checkpoint(self, val_loss, params, master_worker=True):
        if not master_worker:
            return
        if self.verbose:
            self.trace_func(
                f"Validation loss decreased ({self.val_loss_min:.6f} --> "
                f"{val_loss:.6f}).  Saving model ...")
        save_params(self.path, params)
        self.val_loss_min = val_loss
