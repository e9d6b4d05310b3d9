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


def _hash_spec(model):
    """Per-feature hashing spec for the model's ``use_hash`` columns.

    ``in_graph``: integer-keyed hash-bucket features — the exported graph
    hashes them itself (ops/hash.py, FarmHash64 as pure XLA int ops), so
    the artifact accepts RAW keys like the reference's SavedModel
    (reference layers/utils.py:41-121 hashes in-graph). String-dtype and
    vocabulary-file features stay host-side; the spec carries everything
    the host preprocessor needs (make_preprocessor), including the vocab
    table contents so the serving host needs no CSV file."""
    from .features import SparseFeat, VarLenSparseFeat, _is_string_dtype

    spec = {}
    for fc in model.feature_columns:
        if isinstance(fc, (SparseFeat, VarLenSparseFeat)) and fc.use_hash:
            string_keys = _is_string_dtype(fc.dtype)
            entry = {
                "num_buckets": int(fc.vocabulary_size),
                "mask_zero": isinstance(fc, VarLenSparseFeat),
                "varlen": isinstance(fc, VarLenSparseFeat),
                "algorithm": "farmhash",
                # in-graph only where the device kernel is exact: integer
                # keys (jax has no int64 inputs without x64 — the host
                # preprocessor rejects >int32 raw keys at serve time) and
                # buckets < 2^24 (ops/hash.py _mod_small bound)
                "in_graph": (fc.vocabulary_path is None and not string_keys
                             and int(fc.vocabulary_size) < (1 << 24)),
            }
            if fc.vocabulary_path:
                from .hashing import load_vocabulary

                entry["vocabulary"] = dict(load_vocabulary(
                    fc.vocabulary_path))
            spec[fc.name] = entry
    return spec


def _device_hash_batch(batch, in_graph_cols):
    """Apply in-graph hashing to the raw-key features of a traced batch.

    Wide entries carry the 64-bit key as int32 [lo, hi] planes on a
    trailing axis — (B, 2) for scalar features, (B, T, 2) for varlen
    history ids (jax accepts no int64 inputs without x64); narrow entries
    are plain int32 keys with the canonical feature shape."""
    from .ops.hash import (device_hash_bucket, device_hash_bucket_bytes,
                           device_hash_bucket_u64)

    batch = dict(batch)
    for name, e in in_graph_cols.items():
        if e.get("bytes"):
            v = batch[name]  # (B, L+1): byte planes + length column
            ids = device_hash_bucket_bytes(
                v[..., :-1], v[..., -1], e["num_buckets"],
                mask_zero=e["mask_zero"], algorithm=e["algorithm"])
            batch[name] = ids[..., None]  # canonical (B, 1)
        elif e.get("wide"):
            v = batch[name]
            ids = device_hash_bucket_u64(
                v[..., 0], v[..., 1], e["num_buckets"],
                mask_zero=e["mask_zero"], algorithm=e["algorithm"])
            # canonical shapes: scalar (B, 1); varlen already (B, T)
            batch[name] = ids if e.get("varlen") else ids[..., None]
        else:
            batch[name] = device_hash_bucket(
                batch[name], e["num_buckets"], mask_zero=e["mask_zero"],
                algorithm=e["algorithm"])
    return batch


def export_stablehlo(model, path, example_batch, polymorphic_batch=True,
                     platforms=("cpu", "tpu"), bake_weights=None,
                     hash_in_graph=True):
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
    from .ops import attention_block as blk_ops
    from .ops import cin_kernel as cin_ops
    from .ops import small_vocab as sv_ops

    attn_was = (attn_ops.fused_attention_enabled(),
                attn_ops.fused_attention_interpret())
    pool_was = emb_ops.fused_pool_enabled()
    gru_was = (gru_ops.fused_gru_enabled(), gru_ops.fused_gru_interpret())
    sv_was = (sv_ops._STATE["enabled"], sv_ops._STATE["interpret"])
    blk_was = (blk_ops._STATE["enabled"], blk_ops._STATE["interpret"])
    cin_was = (cin_ops._STATE["enabled"], cin_ops._STATE["interpret"])
    attn_ops.set_fused_attention(False)
    emb_ops.set_fused_gather_pool(False)
    gru_ops.set_fused_gru(False)
    sv_ops.set_small_vocab(False)
    blk_ops.set_block_attention(False)
    cin_ops.set_cin_kernel(False)
    if bake_weights is None:
        bake_weights = _weights_nbytes(model) <= _BAKE_LIMIT_BYTES
    # remat only pays in the backward pass; keep inference artifacts plain
    from .layers.base import remat_scope

    _remat_off = remat_scope(False)
    _remat_off.__enter__()
    hash_cols = _hash_spec(model)
    if hash_in_graph in ("wide", "bytes"):
        # 64-bit-capable artifacts: each in-graph hash feature takes int32
        # [lo, hi] planes on a trailing axis — (B, 2) scalar, (B, T, 2)
        # varlen history ids — and device-hashes the full int64 decimal
        # string (ops/hash.py device_hash_bucket_u64), so int64-keyed
        # DIN/DIEN serve raw keys end-to-end.
        for name, e in hash_cols.items():
            if e["in_graph"]:
                e["wide"] = True
    if hash_in_graph == "bytes":
        # fully self-contained STRING-keyed artifacts: each scalar string
        # hash feature enters as (B, L+1) int32 — L UTF-8 byte planes +
        # a length column — and the artifact hashes the raw bytes itself
        # (ops/hash.py device_hash_bucket_bytes, bit-identical to host
        # hash_array / TF to_hash_bucket_fast; keys up to 32 bytes).
        # Varlen string histories stay host-side (rare; demote cleanly).
        from .features import VarLenSparseFeat as _VL
        from .features import _is_string_dtype as _isstr

        by_name = {fc.name: fc for fc in model.feature_columns}
        for name, e in hash_cols.items():
            fc = by_name[name]
            if (_isstr(fc.dtype) and fc.vocabulary_path is None
                    and not isinstance(fc, _VL)
                    and int(fc.vocabulary_size) < (1 << 24)):
                e["in_graph"] = True
                e["bytes"] = True
                e["byte_width"] = 32
                e.pop("wide", None)
    # demote to host-side hashing when the example batch shows raw keys
    # beyond int32 and the feature is not wide (jax has no int64 inputs
    # without x64; an int32 wrap would hash a different decimal string
    # than training did)
    for name, e in hash_cols.items():
        if not e["in_graph"] or e.get("wide") or name not in example_batch:
            continue
        v = np.asarray(example_batch[name])
        if v.dtype.kind in ("i", "u") and v.size and (
                v.astype(np.int64).max() > np.iinfo(np.int32).max
                or v.astype(np.int64).min() < np.iinfo(np.int32).min):
            e["in_graph"] = False
    in_graph_cols = ({k: v for k, v in hash_cols.items() if v["in_graph"]}
                     if hash_in_graph else {})
    if not hash_in_graph:
        hash_cols = {k: dict(v, in_graph=False)
                     for k, v in hash_cols.items()}
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
        for name, e in in_graph_cols.items():
            if e.get("bytes"):
                # string keys enter as (B, L+1) int32: UTF-8 byte planes
                # + a trailing length column
                L = int(e["byte_width"])
                spec[name] = jax.ShapeDtypeStruct(
                    spec[name].shape[:1] + (L + 1,), np.int32)
            elif e.get("wide"):
                # wide features enter as int32 [lo, hi] planes: scalar
                # (B, 2) (the canonical trailing 1 becomes the plane
                # axis), varlen (B, T, 2)
                shp = spec[name].shape
                if e.get("varlen"):
                    spec[name] = jax.ShapeDtypeStruct(shp + (2,), np.int32)
                else:
                    spec[name] = jax.ShapeDtypeStruct(shp[:1] + (2,),
                                                      np.int32)

        if bake_weights:
            serve = model.export_inference_fn()
            if in_graph_cols:
                inner = serve

                @jax.jit
                def serve(batch):
                    return inner(_device_hash_batch(batch, in_graph_cols))

            exported = jax_export.export(
                serve, platforms=list(platforms))(spec)
        else:
            module = model.module
            cd_scope = model._cd_scope

            @jax.jit
            def serve_v(variables, batch):
                if in_graph_cols:
                    batch = _device_hash_batch(batch, in_graph_cols)
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
        sv_ops.set_small_vocab(*sv_was)
        blk_ops.set_block_attention(*blk_was)
        cin_ops.set_cin_kernel(*cin_was)
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    if hash_cols:
        # hash-spec sidecar: which features the ARTIFACT hashes itself
        # (raw integer keys go straight in) vs which the host preprocessor
        # must hash (strings / vocabulary files; make_preprocessor)
        import json

        with open(path + ".hashspec.json", "w") as f:
            json.dump({"features": hash_cols}, f, indent=1)
    return os.path.getsize(path)


def make_preprocessor(spec_or_path):
    """Host-side raw-key preprocessor paired with an exported artifact.

    Input: the ``<artifact>.hashspec.json`` path (or its parsed dict).
    Returns ``prep(raw_feature_dict) -> feature_dict`` where host-side
    hash features (string keys, vocabulary files) are hashed exactly as
    training did (hashing.hash_array) and in-graph features pass through
    as raw integer keys for the artifact to hash itself. The returned
    function exposes ``prep.skip_hash`` — pass it to
    ``canonicalize_batch(..., skip_hash=...)`` so nothing double-hashes.
    """
    import json

    from . import hashing

    if isinstance(spec_or_path, str):
        with open(spec_or_path) as f:
            spec = json.load(f)["features"]
    else:
        spec = dict(spec_or_path.get("features", spec_or_path))

    def prep(x):
        out = dict(x)
        for name, e in spec.items():
            if name not in out:
                continue  # canonicalize_batch reports missing features
            arr = np.asarray(out[name])
            if e.get("in_graph") and e.get("bytes"):
                # bytes-mode artifact: ENCODE only — zero-padded UTF-8
                # byte planes + a length column; the artifact hashes
                s = hashing._stringify(arr).reshape(len(arr), -1)[:, 0]
                L = int(e.get("byte_width", 32))
                planes = np.zeros((len(s), L + 1), np.int32)
                for i, st in enumerate(s):
                    b = str(st).encode("utf-8")
                    if len(b) > L:
                        raise ValueError(
                            "feature '%s': key %r is %d bytes; this "
                            "bytes-mode artifact hashes keys up to %d "
                            "bytes in-graph. Re-export with "
                            "hash_in_graph=False to hash long keys on "
                            "the host" % (name, st, len(b), L))
                    if b:
                        planes[i, :len(b)] = np.frombuffer(b, np.uint8)
                    planes[i, L] = len(b)
                out[name] = planes
                continue
            if e.get("in_graph"):
                if arr.dtype.kind in ("U", "S", "O"):
                    try:
                        arr = arr.astype(np.int64)
                    except ValueError:
                        raise ValueError(
                            "feature '%s' was exported with in-graph "
                            "hashing (integer keys) but received "
                            "non-numeric strings" % name)
                arr = arr.astype(np.int64)
                if e.get("wide"):
                    # 64-bit-capable artifact: split into int32 [lo, hi]
                    # planes the in-graph u64 kernel consumes — (B, 2)
                    # for scalar keys, (B, T, 2) for varlen history ids
                    if e.get("varlen"):
                        v = arr if arr.ndim >= 2 else arr[:, None]
                    else:
                        v = arr.reshape(len(arr), -1)[:, 0]
                    out[name] = np.stack(
                        [(v & 0xFFFFFFFF).astype(np.uint32),
                         ((v >> 32) & 0xFFFFFFFF).astype(np.uint32)],
                        axis=-1).astype(np.int64).astype(np.int32)
                    continue
                if arr.size and (arr.max() > np.iinfo(np.int32).max
                                 or arr.min() < np.iinfo(np.int32).min):
                    # int32 wrap would hash a DIFFERENT decimal string
                    # than training did — fail loudly, never silently
                    raise ValueError(
                        "feature '%s': raw keys exceed int32 (jax has no "
                        "int64 inputs without x64), so the in-graph hash "
                        "cannot reproduce training buckets; re-export "
                        "with hash_in_graph=False to hash 64-bit keys on "
                        "the host" % name)
                out[name] = arr.astype(np.int32)
            elif "vocabulary" in e:
                s = hashing._stringify(arr)
                table = e["vocabulary"]
                uniq, inv = np.unique(s, return_inverse=True)
                ids = np.array([table.get(u, 0) for u in uniq], np.int64)
                out[name] = ids[inv].reshape(arr.shape).astype(np.int32)
            else:
                out[name] = hashing.hash_array(
                    arr, e["num_buckets"], mask_zero=e["mask_zero"],
                    algorithm=e.get("algorithm", "farmhash"))
        return out

    prep.skip_hash = frozenset(spec)
    return prep


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
        spec_path = path + ".hashspec.json"
        prep = (make_preprocessor(spec_path)
                if os.path.exists(spec_path) else None)
        serve = _ARTIFACT_CACHE[key] = (load_stablehlo(path), prep)
    serve, prep = serve
    if prep is not None:
        # raw-key artifact: host preprocessor handles string/vocab
        # features, in-graph features stay raw ints, nothing double-hashes
        xc = canonicalize_batch(prep(batch), feature_columns,
                                skip_hash=prep.skip_hash)
    else:
        xc = canonicalize_batch(batch, feature_columns)
    return np.asarray(serve(xc))
