"""Estimator driver: train/evaluate/predict over input_fns + model_dir
checkpointing + FTRL/Adagrad dual-optimizer split.

Replaces the reference's custom Head + deepctr_model_fn + tf.estimator
runtime (estimator/utils.py:13-162): the linear tower trains with FTRL
(lr 0.005) and everything else with Adagrad (lr 0.01), selected by param
path exactly as the reference selects by variable scope.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np
import optax

from ..training import metrics as metrics_lib
from ..training.optimizers import dual_group_optimizer, ftrl


def _named_opt(name, learning_rate):
    """TF get_optimizer_instance parity (estimator/utils.py:122-123)."""
    if not isinstance(name, str):
        return name  # already an optax transform
    key = name.lower()
    table = {
        "ftrl": lambda lr: ftrl(lr),
        "adagrad": lambda lr: optax.adagrad(lr, initial_accumulator_value=0.1, eps=1e-7),
        "adam": lambda lr: optax.adam(lr),
        "sgd": lambda lr: optax.sgd(lr),
        "rmsprop": lambda lr: optax.rmsprop(lr),
    }
    if key not in table:
        raise ValueError("Unsupported optimizer '{}'".format(name))
    return table[key](learning_rate)


class RunConfig:
    """Native stand-in for ``tf.estimator.RunConfig`` carrying the fields
    reference estimator users actually set (reference
    estimator/models/deepfm.py:39-41 passes one straight through). Any
    object or dict with these attribute names works too — including a real
    tf.estimator.RunConfig."""

    def __init__(self, model_dir=None, tf_random_seed=None,
                 save_checkpoints_steps=None, log_step_count_steps=100,
                 mesh=None, **unused):
        self.model_dir = model_dir
        self.tf_random_seed = tf_random_seed
        self.save_checkpoints_steps = save_checkpoints_steps
        self.log_step_count_steps = log_step_count_steps
        # native equivalent of the reference RunConfig's train_distribute
        # strategy: a jax.sharding.Mesh the model compiles against
        self.mesh = mesh


class Estimator:
    """Drives a CTRModel through input_fn-based train/evaluate/predict."""

    def __init__(self, model, model_dir: Optional[str] = None, task: str = "binary",
                 linear_optimizer="Ftrl", dnn_optimizer="Adagrad", config=None,
                 training_chief_hooks=None):
        self.model = model
        self.model_dir = model_dir
        self.task = task
        self._save_checkpoints_steps = None
        self._log_step_count_steps = None
        if config is not None:
            # Map the RunConfig fields with native equivalents
            # (tf.estimator.RunConfig semantics): model_dir,
            # save_checkpoints_steps -> in-loop checkpoint cadence,
            # log_step_count_steps -> in-loop loss/rate logging,
            # tf_random_seed -> model init/shuffle seed. Anything else
            # (session/cluster knobs) has no runtime here -> warn.
            def _cfg(name):
                if isinstance(config, dict):
                    return config.get(name)
                return getattr(config, name, None)

            if self.model_dir is None:
                self.model_dir = _cfg("model_dir")
            self._save_checkpoints_steps = _cfg("save_checkpoints_steps")
            self._log_step_count_steps = _cfg("log_step_count_steps")
            seed = _cfg("tf_random_seed")
            if seed is not None and self.model.state is None:
                import jax

                self.model.seed = int(seed)
                self.model._rng = jax.random.PRNGKey(int(seed))
            if not any(_cfg(k) is not None for k in (
                    "model_dir", "save_checkpoints_steps",
                    "log_step_count_steps", "tf_random_seed")):
                import warnings

                warnings.warn(
                    "Estimator(config=...): none of the mapped RunConfig "
                    "fields (model_dir, save_checkpoints_steps, "
                    "log_step_count_steps, tf_random_seed) is set; other "
                    "fields carry TF-session policy with no equivalent "
                    "here", stacklevel=2)
        self.config = config
        # SessionRunHook-surface adapters: begin() at train start,
        # after_run(None, None) after each step, end(None) at train end
        # (reference estimator/utils.py:121-162 chief-hook tier semantics).
        self.training_chief_hooks = list(training_chief_hooks or [])
        optimizer = dual_group_optimizer(
            linear_opt=_named_opt(linear_optimizer, 0.005),
            dnn_opt=_named_opt(dnn_optimizer, 0.01),
        )
        loss = "binary_crossentropy" if task == "binary" else "mse"
        mesh = None
        if config is not None:
            mesh = (config.get("mesh") if isinstance(config, dict)
                    else getattr(config, "mesh", None))
        self.model.compile(optimizer, loss, mesh=mesh)
        self._global_step = 0
        self._multi_train_step = None
        self._multi_k = 0
        if self.model_dir:
            self._maybe_restore()

    # ------------------------------------------------------------------
    def _ckpt_path(self):
        return os.path.join(self.model_dir, "checkpoint.bin")

    def _maybe_restore(self):
        path = self._ckpt_path()
        if os.path.exists(path):
            self.model.load_weights(path)
        step_path = path + ".step"
        if os.path.exists(step_path):
            # global_step survives restarts (TF estimator max_steps contract:
            # a restored estimator at max_steps trains 0 further steps)
            with open(step_path) as f:
                self._global_step = int(f.read().strip() or 0)

    def _maybe_save(self):
        if self.model_dir:
            os.makedirs(self.model_dir, exist_ok=True)
            self.model.save_weights(self._ckpt_path())
            with open(self._ckpt_path() + ".step", "w") as f:
                f.write(str(self._global_step))

    # ------------------------------------------------------------------
    def train(self, input_fn, steps: Optional[int] = None, max_steps: Optional[int] = None,
              hooks=None, steps_per_execution: int = 1):
        """Train from an input_fn (reference estimator train contract).

        ``steps_per_execution=K`` scans K optimizer steps inside ONE
        compiled call over K stacked batches (same machinery as
        ``CTRModel.fit``): the host loop then runs once per K steps
        instead of once per step, which matters on a remote TPU where
        each dispatch costs ~1-2 ms. Leftover batches (< K at the end of
        the input) run through the single-step program.
        """
        import jax
        import jax.numpy as jnp

        from ..features import canonicalize_batch

        K = max(1, int(steps_per_execution))
        step_count = 0
        pad_to = None  # fixed device batch shape -> exactly one XLA program
        buf = []  # up to K canonicalized (x, y, w) batches

        active_hooks = list(self.training_chief_hooks) + list(hooks or [])

        def hook_call(method, *args):
            for h in active_hooks:
                fn = getattr(h, method, None)
                if callable(fn):
                    fn(*args)

        hook_call("begin")

        last_loss = [None]  # for log_step_count_steps logging

        def run_single(xc, yc, w):
            if self.model._train_step is None:
                self.model._train_step = self.model._build_train_step()
            self.model._rng, rng = jax.random.split(self.model._rng)
            self.model.state, loss, _ = self.model._train_step(
                self.model.state,
                {k: jnp.asarray(v) for k, v in xc.items()},
                jnp.asarray(yc), jnp.asarray(w), rng,
            )
            last_loss[0] = loss

        def flush(buf):
            if len(buf) == K and K > 1:
                if self._multi_train_step is None or self._multi_k != K:
                    # key the cached program on K: a later train() call
                    # with a different steps_per_execution must re-trace
                    self._multi_train_step = \
                        self.model._build_multi_train_step(K)
                    self._multi_k = K
                xK = {k: jnp.asarray(np.stack([b[0][k] for b in buf]))
                      for k in buf[0][0]}
                yK = jnp.asarray(np.stack([b[1] for b in buf]))
                wK = jnp.asarray(np.stack([b[2] for b in buf]))
                self.model._rng, rng = jax.random.split(self.model._rng)
                self.model.state, losses, _ = self._multi_train_step(
                    self.model.state, xK, yK, wK, rng)
                last_loss[0] = losses[-1]
            else:
                for xc, yc, w in buf:
                    run_single(xc, yc, w)
            buf.clear()

        for xb, yb in input_fn():
            if max_steps is not None and self._global_step >= max_steps:
                break  # TF contract: restored at max_steps -> train 0 steps
            if yb is None:
                raise ValueError("train() requires labels from the input_fn")
            xc = canonicalize_batch(xb, self.model.feature_columns)
            yc = self.model._canon_y(yb)
            n_real = len(yc)
            if pad_to is None:
                pad_to = n_real
            if n_real > pad_to:
                raise ValueError(
                    "input_fn yielded a batch of %d > the first batch's %d; "
                    "batches after the first must not grow (the first batch "
                    "fixes the compiled shape — smaller ones are padded)"
                    % (n_real, pad_to)
                )
            w = np.ones(n_real, np.float32)
            if n_real < pad_to:
                # partial final batch: repeat the last sample with weight 0
                # (data.py convention) instead of retracing a new batch shape
                # — remote-TPU compiles cost 1s-6min each (CLAUDE.md).
                pad = pad_to - n_real
                xc = {k: np.concatenate([v, np.repeat(v[-1:], pad, axis=0)])
                      for k, v in xc.items()}
                yc = np.concatenate([yc, np.repeat(yc[-1:], pad, axis=0)])
                w = np.concatenate([w, np.zeros(pad, np.float32)])
            self.model._ensure_built(xc)
            buf.append((xc, yc, w))
            if len(buf) == K:
                flush(buf)
            step_count += 1
            self._global_step += 1
            hook_call("after_run", None, None)
            # cadences deliberately avoid flushing a PARTIAL buffer: that
            # would compile and run the single-step program mid-training
            # (a remote compile costs 1s-6min) and erode the K-step scan.
            # Checkpoints land at the next buffer boundary; the logged
            # loss may lag up to K-1 steps (TF's async logging is no
            # tighter).
            if (self._save_checkpoints_steps
                    and self._global_step % self._save_checkpoints_steps == 0):
                if buf:
                    self._save_pending = True
                else:
                    self._maybe_save()
            if not buf and getattr(self, "_save_pending", False):
                self._save_pending = False
                self._maybe_save()
            if (self._log_step_count_steps
                    and self._global_step % self._log_step_count_steps == 0):
                import time as _time

                now = _time.time()
                t_last = getattr(self, "_log_t", None)
                rate = ("%.1f steps/sec, " % (self._log_step_count_steps
                                              / (now - t_last))
                        if t_last else "")
                self._log_t = now
                loss_s = ("%.5f" % float(last_loss[0])
                          if last_loss[0] is not None else "n/a")
                print("INFO: global_step = %d, loss = %s (%s)"
                      % (self._global_step, loss_s, rate.rstrip(", ")))
            if steps is not None and step_count >= steps:
                break
            if max_steps is not None and self._global_step >= max_steps:
                break
        flush(buf)  # leftover (< K) batches run single-step
        self._maybe_save()
        hook_call("end", None)
        return self

    def evaluate(self, input_fn, steps: Optional[int] = None, hooks=None):
        preds, labels = [], []
        for i, (xb, yb) in enumerate(input_fn()):
            preds.append(self.model.predict(xb, batch_size=len(yb)))
            labels.append(np.asarray(yb, np.float32).reshape(-1))
            if steps is not None and i + 1 >= steps:
                break
        p = np.concatenate(preds).reshape(-1)
        y = np.concatenate(labels)
        # reference Head metrics (estimator/utils.py:28-71)
        out = {
            "prediction/mean": float(p.mean()),
            "label/mean": float(y.mean()),
            "global_step": self._global_step,
        }
        if self.task == "binary":
            out["LogLoss"] = metrics_lib.logloss_score(y, p)
            out["AUC"] = metrics_lib.auc_score(y, p)
            out["loss"] = out["LogLoss"]
        else:
            out["MSE"] = metrics_lib.mse_score(y, p)
            out["MAE"] = metrics_lib.mae_score(y, p)
            out["loss"] = out["MSE"]
        return out

    def export_stablehlo(self, path, example_batch):
        """Serving-artifact export (the reference estimator's
        export_saved_model / PredictOutput role, estimator/utils.py:92):
        serialize the inference function to a portable StableHLO blob."""
        from .. import serving

        return serving.export_stablehlo(self.model, path, example_batch)

    def predict(self, input_fn, hooks=None):
        """Yields {'pred': ..., 'logits': ...} per example (reference
        PredictOutput export dict, estimator/utils.py:91-117)."""
        eps = 1e-7
        for xb, _ in input_fn():
            p = self.model.predict(xb, batch_size=len(next(iter(xb.values()))))
            p = p.reshape(-1)
            if self.task == "binary":
                logits = np.log(np.clip(p, eps, 1 - eps) / np.clip(1 - p, eps, 1 - eps))
            else:
                logits = p
            for pi, li in zip(p, logits):
                yield {"pred": np.array([pi], np.float32),
                       "logits": np.array([li], np.float32)}
