"""Shared helpers for model factories."""
from __future__ import annotations

import functools
import inspect

import flax.linen as nn

from ..features import build_input_schema
from ..training.model import CTRModel


def unified_feature_columns(*column_lists):
    """Union of feature columns deduped by input name, order-preserving —
    equivalent to the reference's build_input_features(linear + dnn) which
    collapses same-named Inputs (feature_column.py:145-168)."""
    seen = set()
    out = []
    for cols in column_lists:
        for fc in cols or []:
            if fc.name not in seen:
                seen.add(fc.name)
                out.append(fc)
    return out


# factory name -> factory fn, for save_model/load_model round-trips.
# Built-in zoo factories land here on import; USER-DEFINED factories
# decorated with @register do too — which is what lets load_model rebuild
# a custom model (docs/Custom-Models.md), provided the defining module is
# imported before load_model is called.
FACTORY_REGISTRY = {}


def register(fn):
    """Record the factory call on the returned CTRModel for save_model.

    Also the single entry point where tf.feature_column-style compat
    columns (deepctr_tpu/feature_column.py — the reference estimator
    surface, ref estimator/feature_column.py:7-45) are converted to
    framework SparseFeat/DenseFeat specs, so every factory — model and
    estimator tier alike — accepts them. Conversion happens BEFORE the
    call is recorded, so save_model/load_model round-trips see only
    framework specs."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        from ..feature_column import convert_if_compat

        args = tuple(convert_if_compat(a) for a in args)
        kwargs = {k: convert_if_compat(v) for k, v in kwargs.items()}
        model = fn(*args, **kwargs)
        sig = inspect.signature(fn)
        bound = sig.bind(*args, **kwargs)
        bound.apply_defaults()
        model._build_spec = (fn.__name__, dict(bound.arguments))
        return model

    FACTORY_REGISTRY[fn.__name__] = wrapper
    return wrapper


class DenseLogit(nn.Module):
    """Keras Dense(1, use_bias=False) equivalent for tower logits."""

    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            1, use_bias=self.use_bias, kernel_init=nn.initializers.glorot_uniform()
        )(x)
