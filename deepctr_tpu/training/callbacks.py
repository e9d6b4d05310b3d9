"""Training callbacks (Keras-fit parity: the reference trains via
``model.fit`` and users rely on EarlyStopping / ModelCheckpoint, and the
reference FAQ points users at the full tf.keras callback family incl.
batch hooks — /root/reference/docs/source/FAQ.md:26-37).

Protocol: ``on_train_begin(model)``, ``on_epoch_end(model, epoch, logs)``
returning True to stop training, ``on_train_end(model)``.

Per-batch hooks and the ``steps_per_execution`` cadence
-------------------------------------------------------
``on_train_batch_begin(model, batch)`` / ``on_train_batch_end(model,
batch, logs)`` fire once per COMPILED EXECUTION, not once per optimizer
step: with ``fit(steps_per_execution=K)`` the K scanned steps run inside
one XLA call, so the hooks fire on the scan boundary with the
accumulated window in ``logs`` — ``loss`` (size-weighted mean over the
window), ``size`` (examples in the window), ``num_steps`` (K; 1 when
unscanned) — and ``batch`` is the index of the LAST batch in the window.
``on_train_batch_end`` may return True to stop training (checked at the
boundary, like Keras ``model.stop_training``).

fit() only materializes per-step losses on the host (a device sync per
execution) when some callback actually overrides a batch hook — plain
epoch-level callbacks keep the fully-async dispatch pipeline.
"""
from __future__ import annotations

from typing import Optional


class Callback:
    def on_train_begin(self, model):
        pass

    def on_epoch_begin(self, model, epoch: int):
        pass

    def on_epoch_end(self, model, epoch: int, logs: dict) -> Optional[bool]:
        return None

    def on_train_batch_begin(self, model, batch: int):
        pass

    def on_train_batch_end(self, model, batch: int,
                           logs: dict) -> Optional[bool]:
        return None

    def on_train_end(self, model):
        pass


def overrides_batch_hooks(cb) -> bool:
    """True if ``cb`` implements either per-batch hook (fit() uses this to
    decide whether per-execution host syncs are needed at all). A callback
    that overrides the hooks but is configured batch-off (e.g.
    ``CSVLogger(log_batches=False)``) sets ``wants_batch_hooks = False``
    to opt back out of the per-execution sync."""
    wants = getattr(cb, "wants_batch_hooks", None)
    if wants is not None:
        return bool(wants)
    t = type(cb)
    return (t.on_train_batch_begin is not Callback.on_train_batch_begin
            or t.on_train_batch_end is not Callback.on_train_batch_end)


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


class LearningRateScheduler(Callback):
    """Set the LR from ``schedule`` at each epoch start (Keras parity;
    reference users inherit this from tf.keras, FAQ.md:26-37).

    ``schedule(epoch)`` or ``schedule(epoch, current_lr)`` returns the new
    learning rate. Mutation is retrace-free (optimizers.MutableLR): the LR
    scale is a traced scalar in opt_state, so per-epoch changes never
    recompile the train step."""

    def __init__(self, schedule, verbose=0):
        self.schedule = schedule
        self.verbose = verbose

    def on_epoch_begin(self, model, epoch):
        try:
            new_lr = self.schedule(epoch, model.learning_rate)
        except TypeError:
            new_lr = self.schedule(epoch)
        model.learning_rate = float(new_lr)
        if self.verbose:
            print("Epoch %d: LearningRateScheduler setting learning rate "
                  "to %s." % (epoch + 1, float(new_lr)))

    def on_epoch_end(self, model, epoch, logs):
        logs["lr"] = model.learning_rate
        return None


class ReduceLROnPlateau(Callback):
    """Multiply the LR by ``factor`` when ``monitor`` stops improving for
    ``patience`` epochs (Keras parity). Purely multiplicative, so it works
    whether ``model.learning_rate`` speaks absolute values or multipliers."""

    def __init__(self, monitor="val_loss", factor=0.1, patience=10,
                 verbose=0, mode="min", min_delta=1e-4, cooldown=0,
                 min_lr=0.0):
        if factor >= 1.0:
            raise ValueError("ReduceLROnPlateau requires factor < 1.0")
        self.monitor = monitor
        self.factor = factor
        self.patience = patience
        self.verbose = verbose
        self.mode = mode
        self.min_delta = abs(min_delta)
        self.cooldown = cooldown
        self.min_lr = min_lr
        self._best = None
        self._wait = 0
        self._cooldown_counter = 0

    def on_train_begin(self, model):
        self._best, self._wait, self._cooldown_counter = None, 0, 0

    def _improved(self, current):
        if self._best is None:
            return True
        if self.mode == "max":
            return current > self._best + self.min_delta
        return current < self._best - self.min_delta

    def on_epoch_end(self, model, epoch, logs):
        logs["lr"] = model.learning_rate
        current = logs.get(self.monitor)
        if current is None:
            return None
        if self._cooldown_counter > 0:
            self._cooldown_counter -= 1
            self._wait = 0
        if self._improved(current):
            self._best = current
            self._wait = 0
            return None
        if self._cooldown_counter > 0:
            return None
        self._wait += 1
        if self._wait >= self.patience:
            old_lr = model.learning_rate
            if old_lr > self.min_lr:
                new_lr = max(old_lr * self.factor, self.min_lr)
                model.learning_rate = new_lr
                logs["lr"] = new_lr
                if self.verbose:
                    print("Epoch %d: ReduceLROnPlateau reducing learning "
                          "rate to %s." % (epoch + 1, new_lr))
            self._cooldown_counter = self.cooldown
            self._wait = 0
        return None


class CSVLogger(Callback):
    """Stream epoch logs to a CSV file (Keras parity).

    ``log_batches=True`` additionally writes one row per compiled
    execution (see the per-batch cadence note in the module docstring) to
    the sibling file ``filename + ".batches"`` with columns
    epoch,batch,loss,size,num_steps — a separate file keeps the epoch CSV
    schema exactly Keras-compatible."""

    def __init__(self, filename, separator=",", append=False,
                 log_batches=False):
        self.filename = str(filename)
        self.sep = separator
        self.append = append
        self.log_batches = log_batches
        self.wants_batch_hooks = log_batches
        self._file = None
        self._writer = None
        self._keys = None
        self._epoch = 0
        self._bfile = None

    def on_train_begin(self, model):
        import io

        mode = "a" if self.append else "w"
        self._file = io.open(self.filename, mode, newline="")
        self._writer = None
        self._keys = None
        self._epoch = 0
        self._bfile = None
        if self.log_batches:
            self._bfile = io.open(self.filename + ".batches", mode,
                                  newline="")
            if not (self.append and self._bfile.tell() > 0):
                self._bfile.write(self.sep.join(
                    ["epoch", "batch", "loss", "size", "num_steps"]) + "\n")

    def on_epoch_begin(self, model, epoch):
        self._epoch = epoch

    def on_train_batch_end(self, model, batch, logs):
        if self._bfile is not None:
            self._bfile.write(self.sep.join(str(v) for v in [
                self._epoch, batch, logs.get("loss", ""),
                logs.get("size", ""), logs.get("num_steps", "")]) + "\n")
        return None

    def on_epoch_end(self, model, epoch, logs):
        import csv

        if self._writer is None:
            self._keys = sorted(logs)
            self._writer = csv.DictWriter(
                self._file, fieldnames=["epoch"] + self._keys,
                delimiter=self.sep)
            if not (self.append and self._file.tell() > 0):
                self._writer.writeheader()
        row = {"epoch": epoch}
        row.update({k: logs.get(k, "") for k in self._keys})
        self._writer.writerow(row)
        self._file.flush()
        return None

    def on_train_end(self, model):
        if self._file is not None:
            self._file.close()
            self._file = None
        if self._bfile is not None:
            self._bfile.close()
            self._bfile = None


class TensorBoard(Callback):
    """Per-epoch scalar logging readable by TensorBoard (Keras parity for
    the scalars tab). Writes through tf.summary when TensorFlow is
    importable; otherwise falls back to a ``scalars.jsonl`` file in
    ``log_dir`` (same payload, greppable).

    ``update_freq``: "epoch" (default), "batch", or an int N — "batch"
    logs ``batch_loss`` at every compiled execution, N at most every N
    optimizer steps (hooks fire on scan boundaries; see module
    docstring). The step axis counts optimizer steps, so curves line up
    across different ``steps_per_execution`` settings."""

    def __init__(self, log_dir="./logs", update_freq="epoch"):
        self.log_dir = str(log_dir)
        self.update_freq = update_freq
        self.wants_batch_hooks = update_freq != "epoch"
        self._writer = None
        self._jsonl = None
        self._step = 0
        self._last_logged = 0

    def on_train_begin(self, model):
        import os

        os.makedirs(self.log_dir, exist_ok=True)
        try:
            import tensorflow as tf

            self._writer = tf.summary.create_file_writer(self.log_dir)
        except Exception:
            import io

            self._jsonl = io.open(
                os.path.join(self.log_dir, "scalars.jsonl"), "a")

    def _write_scalars(self, payload, step):
        if self._writer is not None:
            import tensorflow as tf

            with self._writer.as_default():
                for k, v in payload.items():
                    tf.summary.scalar(k, float(v), step=step)
            self._writer.flush()
        elif self._jsonl is not None:
            import json

            self._jsonl.write(json.dumps(
                {"step": step, **{k: float(v) for k, v in payload.items()}}
            ) + "\n")
            self._jsonl.flush()

    def on_train_batch_end(self, model, batch, logs):
        self._step += logs.get("num_steps", 1)
        if self.update_freq == "epoch":
            return None
        every = 1 if self.update_freq == "batch" else int(self.update_freq)
        if self._step - self._last_logged >= every:
            self._last_logged = self._step
            self._write_scalars(
                {"batch_" + k: v for k, v in logs.items()
                 if k != "num_steps"}, self._step)
        return None

    def on_epoch_end(self, model, epoch, logs):
        if self._writer is not None:
            import tensorflow as tf

            with self._writer.as_default():
                for k, v in logs.items():
                    tf.summary.scalar("epoch_" + k, float(v), step=epoch)
            self._writer.flush()
        elif self._jsonl is not None:
            import json

            self._jsonl.write(json.dumps({"epoch": epoch, **{
                k: float(v) for k, v in logs.items()}}) + "\n")
            self._jsonl.flush()
        return None

    def on_train_end(self, model):
        if self._writer is not None:
            self._writer.close()
            self._writer = None
        if self._jsonl is not None:
            self._jsonl.close()
            self._jsonl = None
