"""Portable serving artifacts: StableHLO export / load.

The reference's serving story is the Estimator ``PredictOutput`` export
(reference estimator/utils.py:91-117), consumed by TF Serving as a
SavedModel. The TPU-native equivalent is a serialized ``jax.export``
artifact: the jitted inference function — weights baked in — lowered to
StableHLO bytes that any later process can load and call (CPU/TPU, no
model-building Python required, no framework version lock-in at the
layer-code level).

    model.fit(x, y, ...)
    from deepctr_tpu import serving
    serving.export_stablehlo(model, "model.shlo", example_batch=x)

    # ... later, in a server process:
    serve = serving.load_stablehlo("model.shlo")
    preds = serve(canonicalize_batch(batch, feature_columns))

The batch dimension is exported SYMBOLICALLY (``jax.export`` shape
polymorphism), so one artifact serves any batch size.
"""
from __future__ import annotations

import os

import jax
import numpy as np
from jax import export as jax_export

from .features import canonicalize_batch


def _weights_nbytes(model):
    return sum(
        int(np.prod(l.shape)) * l.dtype.itemsize
        for l in jax.tree_util.tree_leaves(
            (model.state.params, model.state.model_state)))


# jax.export serializes through flatbuffers, which hard-caps the buffer
# at 2 GB — weights baked as constants hit it at ~1B bf16 params.
_BAKE_LIMIT_BYTES = int(1.8 * 2 ** 30)


def export_stablehlo(model, path, example_batch, polymorphic_batch=True,
                     platforms=("cpu", "tpu"), bake_weights=None):
    """Serialize ``model``'s inference function to a StableHLO artifact.

    example_batch: a feature dict (raw or canonical) used only for each
    input's per-example shape and dtype. With ``polymorphic_batch`` the
    leading dimension is exported as a symbol, so the artifact accepts
    any batch size; set it False to pin the example batch size (slightly
    more compiler freedom).

    ``platforms`` is baked into the artifact — the default covers the
    export-on-TPU / serve-on-CPU flow; exporting only for the current
    backend would make the artifact raise at call time elsewhere.

    ``bake_weights``: True embeds the weights as constants (single-file
    artifact). flatbuffers caps serialized artifacts at 2 GB, so
    billion-parameter embedding models cannot bake; False exports the
    graph with weights as ARGUMENTS and writes them to a ``path +
    ".weights"`` msgpack sidecar (``load_stablehlo`` picks it up
    transparently). Default (None): bake when the weights fit, sidecar
    when they don't.
    """
    # The fused Pallas funnels must not leak into the artifact: a
    # tpu_custom_call pins it to one platform/Mosaic version, and the
    # kernels' block-padding arithmetic does not trace under symbolic
    # batch dims. Export always traces the plain-XLA paths.
    from .ops import attention as attn_ops
    from .ops import embedding as emb_ops
    from .ops import gru as gru_ops

    attn_was = (attn_ops.fused_attention_enabled(),
                attn_ops.fused_attention_interpret())
    pool_was = emb_ops.fused_pool_enabled()
    gru_was = (gru_ops.fused_gru_enabled(), gru_ops.fused_gru_interpret())
    attn_ops.set_fused_attention(False)
    emb_ops.set_fused_gather_pool(False)
    gru_ops.set_fused_gru(False)
    if bake_weights is None:
        bake_weights = _weights_nbytes(model) <= _BAKE_LIMIT_BYTES
    # remat only pays in the backward pass; keep inference artifacts plain
    from .layers.base import remat_scope

    _remat_off = remat_scope(False)
    _remat_off.__enter__()
    try:
        xc = canonicalize_batch(example_batch, model.feature_columns)

        if polymorphic_batch:
            (b,) = jax_export.symbolic_shape("b")
            spec = {
                k: jax.ShapeDtypeStruct((b,) + v.shape[1:], v.dtype)
                for k, v in xc.items()
            }
        else:
            spec = {k: jax.ShapeDtypeStruct(v.shape, v.dtype)
                    for k, v in xc.items()}

        if bake_weights:
            serve = model.export_inference_fn()
            exported = jax_export.export(
                serve, platforms=list(platforms))(spec)
        else:
            module = model.module
            cd_scope = model._cd_scope

            @jax.jit
            def serve_v(variables, batch):
                with cd_scope():
                    return module.apply(variables, batch, training=False)

            variables = {"params": model.state.params,
                         **model.state.model_state}
            host_vars = jax.device_get(variables)
            var_spec = jax.tree.map(
                lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), host_vars)
            exported = jax_export.export(
                serve_v, platforms=list(platforms))(var_spec, spec)
            import flax

            with open(path + ".weights", "wb") as f:
                f.write(flax.serialization.msgpack_serialize(
                    host_vars, in_place=True))
    finally:
        _remat_off.__exit__(None, None, None)
        attn_ops.set_fused_attention(*attn_was)
        emb_ops.set_fused_gather_pool(pool_was)
        gru_ops.set_fused_gru(*gru_was)
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    return os.path.getsize(path)


def load_stablehlo(path):
    """Load a serving artifact; returns ``fn(canonical_batch) -> preds``.

    Baked artifacts embed the weights; sidecar artifacts (exported with
    ``bake_weights=False``) load them from ``path + ".weights"`` here —
    either way the serving process needs no model-building Python.
    """
    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    sidecar = path + ".weights"
    if os.path.exists(sidecar):
        import flax

        with open(sidecar, "rb") as f:
            variables = flax.serialization.msgpack_restore(f.read())

        def serve(batch):
            return exported.call(variables, batch)
    else:
        def serve(batch):
            return exported.call(batch)

    return serve


# (path, mtime) -> loaded serve fn; the artifact embeds all weights, so
# re-deserializing per call would pay a full weight read per request
_ARTIFACT_CACHE: dict = {}


def predict_with_artifact(path, batch, feature_columns):
    """Convenience: canonicalize a raw feature dict and run the artifact.

    The deserialized artifact is cached by (path, mtime); server loops
    should still prefer one explicit ``load_stablehlo`` call.
    """
    st = os.stat(path)
    abspath = os.path.abspath(path)
    key = (abspath, st.st_mtime_ns, st.st_size)
    serve = _ARTIFACT_CACHE.get(key)
    if serve is None:
        # drop stale versions of THIS file only (serving several distinct
        # artifacts must not thrash the cache)
        for k in [k for k in _ARTIFACT_CACHE if k[0] == abspath]:
            del _ARTIFACT_CACHE[k]
        serve = _ARTIFACT_CACHE[key] = load_stablehlo(path)
    xc = canonicalize_batch(batch, feature_columns)
    return np.asarray(serve(xc))
