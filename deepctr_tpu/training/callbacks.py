"""Training callbacks (Keras-fit parity: the reference trains via
``model.fit`` and users rely on EarlyStopping / ModelCheckpoint).

Protocol: ``on_train_begin(model)``, ``on_epoch_end(model, epoch, logs)``
returning True to stop training, ``on_train_end(model)``.
"""
from __future__ import annotations

from typing import Optional


class Callback:
    def on_train_begin(self, model):
        pass

    def on_epoch_end(self, model, epoch: int, logs: dict) -> Optional[bool]:
        return None

    def on_train_end(self, model):
        pass


class EarlyStopping(Callback):
    """Stop when ``monitor`` stops improving for ``patience`` epochs."""

    def __init__(self, monitor="val_loss", min_delta=0.0, patience=0, mode="min",
                 restore_best_weights=False, verbose=0):
        self.monitor = monitor
        self.min_delta = abs(min_delta)
        self.patience = patience
        self.mode = mode
        self.restore_best_weights = restore_best_weights
        self.verbose = verbose
        self._best = None
        self._wait = 0
        self._best_state = None

    def _improved(self, current):
        if self._best is None:
            return True
        if self.mode == "max":
            return current > self._best + self.min_delta
        return current < self._best - self.min_delta

    def on_train_begin(self, model):
        self._best, self._wait, self._best_state = None, 0, None

    def on_epoch_end(self, model, epoch, logs):
        current = logs.get(self.monitor)
        if current is None:
            return None
        if self._improved(current):
            self._best = current
            self._wait = 0
            if self.restore_best_weights and model.state is not None:
                # deep-copy: the live buffers get donated by later train
                # steps, which would delete them out from under us
                import jax
                import jax.numpy as jnp

                self._best_state = jax.tree.map(
                    lambda x: jnp.array(x, copy=True), model.state
                )
            return None
        self._wait += 1
        if self._wait > self.patience:
            if self.verbose:
                print("Epoch %d: early stopping (%s=%.5f best=%.5f)" % (
                    epoch + 1, self.monitor, current, self._best))
            if self.restore_best_weights and self._best_state is not None:
                model.state = self._best_state
            return True
        return None


class ModelCheckpoint(Callback):
    """Save weights each epoch (optionally only on improvement)."""

    def __init__(self, filepath, monitor="val_loss", save_best_only=False,
                 mode="min", verbose=0):
        self.filepath = filepath
        self.monitor = monitor
        self.save_best_only = save_best_only
        self.mode = mode
        self.verbose = verbose
        self._best = None

    def on_epoch_end(self, model, epoch, logs):
        path = self.filepath.format(epoch=epoch + 1, **logs)
        if self.save_best_only:
            current = logs.get(self.monitor)
            if current is None:
                return None
            better = (
                self._best is None
                or (self.mode == "max" and current > self._best)
                or (self.mode != "max" and current < self._best)
            )
            if not better:
                return None
            self._best = current
        if self.verbose:
            print("Epoch %d: saving model to %s" % (epoch + 1, path))
        model.save_weights(path)
        return None
