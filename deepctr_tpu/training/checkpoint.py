"""Checkpointing: weight files (msgpack) and whole-model save/load.

Replaces the reference's h5 ``save_weights/load_weights`` and
``save_model/load_model + custom_objects`` flow (tests/utils.py:371-379):

- weights: flax.serialization msgpack of {params, model_state}
- whole model: the factory name + its (serialized) kwargs + weights; no
  custom_objects registry is needed because models rebuild from the factory.
- ``DenseFeat.transform_fn`` lambdas are serialized by marshaling their code
  objects (same trick Keras uses for Lambda layers).
"""
from __future__ import annotations

import builtins
import marshal
import pickle
import types

import flax
import jax.numpy as jnp
import numpy as np


def _dummy_batch(feature_columns):
    """Zero batch matching the input schema, for initializing before load."""
    from ..features import build_input_schema

    schema = build_input_schema(feature_columns)
    out = {}
    for name, spec in schema.items():
        dtype = np.int32 if spec.dtype == "int32" else np.float32
        out[name] = np.zeros((2,) + spec.shape, dtype)
    return out


def _ensure_built_for_io(model):
    if model.state is None:
        model._ensure_built(_dummy_batch(model.feature_columns))


def _weights_view(variables):
    """Weight collections only: the 'lookup_stats' diagnostic counter
    (a2a capacity-overflow total) is run-local, not a weight — keeping it
    out makes weight files loadable into models compiled without it."""
    ms = {k: v for k, v in variables["model_state"].items()
          if k != "lookup_stats"}
    return {"params": variables["params"], "model_state": ms}


def save_weights(model, path):
    _ensure_built_for_io(model)
    blob = flax.serialization.to_bytes(_weights_view(model.get_variables()))
    with open(path, "wb") as f:
        f.write(blob)


def load_weights(model, path):
    _ensure_built_for_io(model)
    with open(path, "rb") as f:
        blob = f.read()
    live = model.get_variables()
    restored = flax.serialization.from_bytes(_weights_view(live), blob)
    model_state = dict(restored["model_state"])
    if "lookup_stats" in live["model_state"]:
        model_state["lookup_stats"] = live["model_state"]["lookup_stats"]
    model.state = model.state.replace(
        params=restored["params"], model_state=model_state
    )
    # optimizer state refers to the old params only structurally; keep it.
    model._predict_step = None
    return model


# --------------------- full train-state IO (orbax) -------------------------


def save_train_state(model, ckpt_dir):
    """Checkpoint the FULL TrainState (params + optimizer state + model
    state + step + sparse-embedding accumulators) with orbax — true
    mid-training resume, unlike weight files (SURVEY §5 build note)."""
    import os

    import orbax.checkpoint as ocp

    _ensure_built_for_io(model)
    path = os.path.abspath(ckpt_dir)
    ckptr = ocp.StandardCheckpointer()
    state = model.state
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "model_state": state.model_state,
        "step": state.step,
    }
    if state.embed_state is not None:
        payload["embed_state"] = state.embed_state
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()


def restore_train_state(model, ckpt_dir):
    """Restore a TrainState saved by save_train_state into ``model``."""
    import os

    import orbax.checkpoint as ocp

    _ensure_built_for_io(model)
    path = os.path.abspath(ckpt_dir)
    ckptr = ocp.StandardCheckpointer()
    state = model.state
    template = {
        "params": state.params,
        "opt_state": state.opt_state,
        "model_state": state.model_state,
        "step": state.step,
    }
    if state.embed_state is not None:
        template["embed_state"] = state.embed_state
    restored = ckptr.restore(path, template)
    model.state = state.replace(
        params=restored["params"], opt_state=restored["opt_state"],
        model_state=restored["model_state"], step=restored["step"],
        embed_state=restored.get("embed_state", state.embed_state),
    )
    model._predict_step = None
    return model


# --------------------------- whole-model IO --------------------------------


class _MarshaledFn:
    def __init__(self, fn):
        if fn.__closure__:
            raise ValueError(
                "Cannot serialize a closure-capturing transform_fn; use a "
                "top-level function or a closure-free lambda."
            )
        self.code = marshal.dumps(fn.__code__)
        self.name = fn.__name__
        self.defaults = fn.__defaults__

    def restore(self):
        import jax
        import jax.numpy as _jnp

        g = {"__builtins__": builtins, "np": np, "numpy": np, "jnp": _jnp, "jax": jax}
        return types.FunctionType(marshal.loads(self.code), g, self.name, self.defaults)


def _encode(obj):
    if isinstance(obj, types.FunctionType):
        return _MarshaledFn(obj)
    if isinstance(obj, dict):
        return {k: _encode(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_encode(v) for v in obj)
    from ..features import DenseFeat, SparseFeat, VarLenSparseFeat

    if isinstance(obj, DenseFeat) and isinstance(obj.transform_fn, types.FunctionType):
        return ("__densefeat__", _encode(obj.name), obj.dimension, obj.dtype,
                _MarshaledFn(obj.transform_fn))
    if isinstance(obj, VarLenSparseFeat):
        return ("__varlenfeat__", _encode(obj.sparsefeat), obj.maxlen, obj.combiner,
                obj.length_name, obj.weight_name, obj.weight_norm)
    return obj


def _decode(obj):
    if isinstance(obj, _MarshaledFn):
        return obj.restore()
    if isinstance(obj, dict):
        return {k: _decode(v) for k, v in obj.items()}
    if isinstance(obj, tuple) and len(obj) >= 1 and obj and obj[0] == "__densefeat__":
        from ..features import DenseFeat

        _, name, dim, dtype, fn = obj
        return DenseFeat(name, dim, dtype, _decode(fn))
    if isinstance(obj, tuple) and obj and obj[0] == "__varlenfeat__":
        from ..features import VarLenSparseFeat

        _, sf, maxlen, combiner, length_name, weight_name, weight_norm = obj
        return VarLenSparseFeat(_decode(sf), maxlen, combiner, length_name,
                                weight_name, weight_norm)
    if isinstance(obj, (list, tuple)):
        return type(obj)(_decode(v) for v in obj)
    return obj


def save_model(model, path):
    if model._build_spec is None:
        raise ValueError(
            "Model was not created through a registered factory; use save_weights."
        )
    _ensure_built_for_io(model)
    factory_name, kwargs = model._build_spec
    payload = {
        "factory": factory_name,
        "kwargs": _encode(kwargs),
        "weights": flax.serialization.to_bytes(model.get_variables()),
        "task": model.task,
        "num_outputs": model.num_outputs,
        # numeric-config part of compile() that changes what predict()
        # computes — must survive the round-trip (optimizer state doesn't;
        # re-compile to continue training)
        "compile": {
            "embedding_dtype": model.embedding_dtype,
            "compute_dtype": model.compute_dtype,
        },
    }
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_model(path):
    with open(path, "rb") as f:
        payload = pickle.load(f)
    from .. import models as models_lib

    factory = getattr(models_lib, payload["factory"], None)
    if factory is None:
        # user-defined factories decorated with @register
        # (docs/Custom-Models.md) — resolvable once their module is imported
        from ..models._common import FACTORY_REGISTRY

        factory = FACTORY_REGISTRY.get(payload["factory"])
    if factory is None:
        raise ValueError(
            "Unknown model factory '{}'. For a custom model, import the "
            "module that defines the @register-decorated factory before "
            "calling load_model (docs/Custom-Models.md).".format(
                payload["factory"]))
    kwargs = _decode(payload["kwargs"])
    model = factory(**kwargs)
    cc = payload.get("compile", {})
    if cc.get("embedding_dtype") or cc.get("compute_dtype"):
        # restore the numeric config predict() depends on (the default
        # compile below would reset it); optimizer is the default — re-
        # compile with a real one to continue training
        model.compile(embedding_dtype=cc.get("embedding_dtype"),
                      compute_dtype=cc.get("compute_dtype"))
    _ensure_built_for_io(model)
    target = model.get_variables()
    restored = flax.serialization.from_bytes(target, payload["weights"])
    model.state = model.state.replace(
        params=restored["params"], model_state=restored["model_state"]
    )
    return model
