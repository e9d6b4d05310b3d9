"""Regression tests for the round-1 code-review findings."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.utils import SAMPLE_SIZE, get_test_data


def test_dsin_direct_gathers_keep_dense_grads_in_sparse_mode():
    """Finding 1: DSIN reads tables directly (outside the lookup funnel);
    under sparse_embedding_updates those tables must stay on the dense
    gradient path — and must be excluded from the gather plan."""
    from tests.models.DSIN_test import get_xy_fd

    x, y, feature_columns, behavior_list = get_xy_fd()
    from deepctr_tpu.models import DSIN
    from deepctr_tpu.features import canonicalize_batch

    model = DSIN(feature_columns, behavior_list, sess_max_count=2,
                 dnn_hidden_units=[4])
    model.compile("adam", "binary_crossentropy", sparse_embedding_updates=True)
    xc = canonicalize_batch(x, model.feature_columns)
    model._ensure_built(xc)
    planned_tables = {e.table_path for e in model._gather_plan}
    # the directly-accessed item/item_gender tables must NOT be planned
    for p in planned_tables:
        assert p[-1] not in ("emb_item", "emb_item_gender"), p
    # training still works and updates the direct tables
    before = np.asarray(
        model.state.params["embeddings"]["emb_item"]
    ).copy()
    model.fit(x, y, batch_size=4, epochs=2, verbose=0)
    after = np.asarray(model.state.params["embeddings"]["emb_item"])
    assert not np.allclose(before, after), "direct table got no updates"


def test_recompile_after_fit_rebinds_optimizer():
    """Finding 4: compile() on a built model must rebuild optimizer state."""
    import optax

    from deepctr_tpu.models import WDL

    x, y, cols = get_test_data(SAMPLE_SIZE, sparse_feature_num=2,
                               dense_feature_num=1)
    model = WDL(cols, cols, dnn_hidden_units=(4,))
    model.compile("adam", "binary_crossentropy")
    model.fit(x, y, batch_size=8, epochs=1, verbose=0)
    model.compile("sgd", "binary_crossentropy")  # would crash pre-fix
    model.fit(x, y, batch_size=8, epochs=1, verbose=0)
    model.compile(optax.adagrad(0.01), "binary_crossentropy")
    model.fit(x, y, batch_size=8, epochs=1, verbose=0)


def test_early_stopping_restore_best_weights_survives_donation():
    """Finding 2: restored best weights must be usable after later train
    steps donated the live buffers."""
    from deepctr_tpu.models import WDL
    from deepctr_tpu.training.callbacks import EarlyStopping

    x, y, cols = get_test_data(SAMPLE_SIZE, sparse_feature_num=2,
                               dense_feature_num=1)
    model = WDL(cols, cols, dnn_hidden_units=(4,))
    model.compile("adam", "binary_crossentropy")
    es = EarlyStopping(monitor="loss", patience=1, min_delta=10.0,
                       restore_best_weights=True)
    model.fit(x, y, batch_size=8, epochs=10, verbose=0, callbacks=[es])
    preds = model.predict(x, batch_size=8)  # would raise 'Array deleted'
    assert np.all(np.isfinite(preds))


def test_export_inference_fn_survives_further_training():
    """Finding 3: the exported serving fn must keep working after fit()."""
    from deepctr_tpu.models import WDL
    from deepctr_tpu.features import canonicalize_batch

    x, y, cols = get_test_data(SAMPLE_SIZE, sparse_feature_num=2,
                               dense_feature_num=1)
    model = WDL(cols, cols, dnn_hidden_units=(4,))
    model.compile("adam", "binary_crossentropy")
    model.fit(x, y, batch_size=8, epochs=1, verbose=0)
    serve = model.export_inference_fn()
    xc = {k: jnp.asarray(v) for k, v in
          canonicalize_batch(x, model.feature_columns).items()}
    before = np.asarray(serve(xc))
    model.fit(x, y, batch_size=8, epochs=2, verbose=0)  # donates buffers
    after = np.asarray(serve(xc))
    np.testing.assert_allclose(before, after, rtol=1e-6)


def test_fused_gather_pool_clips_oov_ids():
    """Finding 5: OOV ids must clamp like every other lookup path."""
    from deepctr_tpu.ops.embedding import fused_gather_pool, reference_gather_pool

    rng = np.random.RandomState(0)
    V, E, B, T = 16, 8, 4, 3
    table = jnp.asarray(rng.standard_normal((V, E)).astype(np.float32))
    ids = jnp.asarray([[0, 5, 99], [200, 1, 2], [15, 16, 17], [3, 3, 3]],
                      dtype=jnp.int32)
    mask = jnp.ones((B, T), jnp.float32)
    got = fused_gather_pool(table, ids, mask, "sum", True)
    want = reference_gather_pool(table, ids, mask, "sum")  # take mode=clip
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)
    # gradient path also clips consistently
    g = jax.grad(lambda t: jnp.sum(fused_gather_pool(t, ids, mask, "sum", True)))(table)
    g_ref = jax.grad(lambda t: jnp.sum(reference_gather_pool(t, ids, mask, "sum")))(table)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-5)


def test_sharded_lookup_clips_oov_ids():
    """Finding 10: mesh lookup must clamp OOV like the single-chip path."""
    from deepctr_tpu.parallel.mesh import make_mesh
    from deepctr_tpu.parallel.sharded_lookup import (
        place_for_sharded_lookup,
        sharded_lookup,
    )

    mesh = make_mesh((4, 2), ("data", "model"), jax.devices()[:8])
    rng = np.random.RandomState(0)
    V, E = 64, 8
    table = jnp.asarray(rng.standard_normal((V, E)).astype(np.float32))
    ids = jnp.asarray([0, 63, 64, 1000, 5, 6, 7, 8], dtype=jnp.int32)
    t_s, i_s = place_for_sharded_lookup(table, ids, mesh)
    got = sharded_lookup(t_s, i_s, mesh)
    want = jnp.take(table, ids, axis=0, mode="clip")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_tfrecord_scalar_default_value():
    """Finding 6: scalar default_value must broadcast to the feature shape."""
    import io
    import struct

    from deepctr_tpu.estimator.tfrecord import read_tfrecord_examples
    from deepctr_tpu.estimator.inputs import FixedLenFeature

    # build a tiny tfrecord with two Examples, second missing feature 'b'
    def feature_int(vals):
        payload = b""
        for v in vals:
            payload += b"\x08" + _varint(v)
        return b"\x1a" + _varint(len(payload)) + payload  # field 3 Int64List

    def _varint(v):
        out = b""
        while True:
            b7 = v & 0x7F
            v >>= 7
            if v:
                out += bytes([b7 | 0x80])
            else:
                out += bytes([b7])
                return out

    def kv(key, feat):
        entry = (b"\x0a" + _varint(len(key)) + key
                 + b"\x12" + _varint(len(feat)) + feat)
        return b"\x0a" + _varint(len(entry)) + entry  # Features.feature

    def example(features: dict):
        feats = b"".join(kv(k.encode(), feature_int(v))
                         for k, v in features.items())
        inner = b"\x0a" + _varint(len(feats)) + feats  # Example.features
        return inner

    buf = io.BytesIO()
    for ex in [example({"a": [1], "b": [2]}), example({"a": [3]})]:
        buf.write(struct.pack("<Q", len(ex)))
        buf.write(b"\x00" * 4)
        buf.write(ex)
        buf.write(b"\x00" * 4)
    import tempfile, os

    with tempfile.NamedTemporaryFile(suffix=".tfrecords", delete=False) as f:
        f.write(buf.getvalue())
        path = f.name
    try:
        out = read_tfrecord_examples(path, {
            "a": FixedLenFeature((1,), "int64"),
            "b": FixedLenFeature((1,), "int64", default_value=7),
        })
        np.testing.assert_array_equal(out["a"].reshape(-1), [1, 3])
        np.testing.assert_array_equal(out["b"].reshape(-1), [2, 7])
    finally:
        os.unlink(path)


def test_estimator_num_epochs_none_repeats():
    """Finding 8: num_epochs=None must repeat indefinitely; bound by steps."""
    import pandas as pd

    from deepctr_tpu.estimator.inputs import input_fn_pandas

    df = pd.DataFrame({"a": np.arange(10), "label": np.zeros(10)})
    it = input_fn_pandas(df, ["a"], "label", batch_size=5, num_epochs=None)()
    seen = 0
    for xb, yb in it:
        seen += 1
        if seen >= 7:  # more than the 2 batches a single epoch holds
            break
    assert seen == 7


def test_sparse_mode_lazy_l2_counts_once():
    """Finding 9: lazy l2 fires once per plan entry even when a feature is
    looked up several times (e.g. DIN query + dnn lists)."""
    from deepctr_tpu.training import sparse_embedding as se

    rows = {"m": {"feat": jnp.ones((4, 2))}}
    plan = [se.PlanEntry(("m",), "feat", "feat", 0, 0.5)]
    total = se.lazy_l2(rows, plan)
    np.testing.assert_allclose(float(total), 0.5 * 8.0)


def test_sparse_embedding_updates_rejects_unknown_strings():
    """Any string other than 'auto' must raise, not silently enable the
    engine via truthiness (review round-2 finding)."""
    import pytest

    from deepctr_tpu import DenseFeat, SparseFeat
    from deepctr_tpu.models import WDL

    cols = [SparseFeat("a", 10, 4), DenseFeat("d", 1)]
    m = WDL(cols, cols, dnn_hidden_units=(4,))
    with pytest.raises(ValueError, match="auto"):
        m.compile("adam", "binary_crossentropy",
                  sparse_embedding_updates="off")


def test_large_vocab_hash_export_falls_back_to_host(tmp_path):
    """use_hash with vocabulary_size >= 2^24 cannot hash in-graph
    (ops/hash.py bound) — export must demote to host-side hashing, not
    crash (round-4 review finding)."""
    import numpy as np

    from deepctr_tpu import DenseFeat, SparseFeat, serving
    from deepctr_tpu.models import DeepFM

    rng = np.random.RandomState(0)
    cols = [SparseFeat("big", 1 << 24, 4, use_hash=True),
            DenseFeat("d0", 1)]
    x = {"big": rng.randint(0, 10**9, 32), "d0": rng.rand(32).astype("f4")}
    y = rng.randint(0, 2, 32).astype("f4")
    m = DeepFM(cols, cols, dnn_hidden_units=(4,))
    m.compile("adam", "binary_crossentropy")
    m.fit(x, y, batch_size=16, epochs=1, verbose=0)
    path = str(tmp_path / "big.shlo")
    serving.export_stablehlo(m, path, example_batch=x)
    import json
    spec = json.load(open(path + ".hashspec.json"))["features"]
    assert not spec["big"]["in_graph"]
    got = serving.predict_with_artifact(path, x, cols)
    want = m.predict(x)
    np.testing.assert_allclose(got.reshape(-1), want.reshape(-1),
                               rtol=1e-5, atol=1e-6)


def test_int64_keys_demote_or_raise(tmp_path):
    """Raw keys beyond int32 cannot hash in-graph (jax has no int64
    inputs): export demotes when the example batch shows them; a
    preprocessor hitting them at serve time raises with the remedy."""
    import numpy as np
    import pytest

    from deepctr_tpu import DenseFeat, SparseFeat, serving
    from deepctr_tpu.models import DeepFM

    rng = np.random.RandomState(0)
    cols = [SparseFeat("h", 1000, 4, use_hash=True), DenseFeat("d0", 1)]
    big_keys = rng.randint(0, 2**62, 32).astype(np.int64)
    x = {"h": big_keys, "d0": rng.rand(32).astype("f4")}
    y = rng.randint(0, 2, 32).astype("f4")
    m = DeepFM(cols, cols, dnn_hidden_units=(4,))
    m.compile("adam", "binary_crossentropy")
    m.fit(x, y, batch_size=16, epochs=1, verbose=0)
    path = str(tmp_path / "i64.shlo")
    serving.export_stablehlo(m, path, example_batch=x)
    import json
    spec = json.load(open(path + ".hashspec.json"))["features"]
    assert not spec["h"]["in_graph"]  # demoted at export
    got = serving.predict_with_artifact(path, x, cols)
    np.testing.assert_allclose(got.reshape(-1), m.predict(x).reshape(-1),
                               rtol=1e-5, atol=1e-6)

    # an in-graph spec meeting int64 keys at serve time must refuse
    prep = serving.make_preprocessor(
        {"features": {"h": {"num_buckets": 1000, "mask_zero": False,
                            "algorithm": "farmhash", "in_graph": True}}})
    with pytest.raises(ValueError, match="int32"):
        prep({"h": big_keys})


def test_custom_objects_tf_membership():
    from deepctr_tpu.layers import custom_objects

    assert "tf" in custom_objects
    assert custom_objects.get("tf") is not None


def test_varlen_pooling_dict_path_seq_mask_zero_off():
    """seq_mask_zero=False parity between the container path and the
    dict path (round-4 review finding)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import flax.linen as nn

    from deepctr_tpu import SparseFeat, VarLenSparseFeat
    from deepctr_tpu.inputs import (create_embedding_matrix,
                                    get_varlen_pooling_list,
                                    varlen_embedding_lookup)

    cols = (VarLenSparseFeat(SparseFeat("v", 20, 4), maxlen=3),)
    feats = {"v": jnp.array([[1, 0, 2], [3, 0, 0]])}

    class M(nn.Module):
        @nn.compact
        def __call__(self, features):
            tables = create_embedding_matrix(cols, l2_reg=0.0,
                                             seq_mask_zero=False)
            seq = varlen_embedding_lookup(tables, features, cols)
            via_dict = get_varlen_pooling_list(seq, features, cols,
                                               to_list=True,
                                               seq_mask_zero=False)
            via_tables = get_varlen_pooling_list(tables, features, cols,
                                                 to_list=True)
            return via_dict[0], via_tables[0]

    m = M()
    params = m.init(jax.random.PRNGKey(0), feats)
    a, b = m.apply(params, feats)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_ftrl_lr_mutation_warns():
    import warnings

    import numpy as np

    from deepctr_tpu import DenseFeat, SparseFeat
    from deepctr_tpu.models import WDL

    rng = np.random.RandomState(0)
    cols = [SparseFeat("s", 10, 4), DenseFeat("d", 1)]
    x = {"s": rng.randint(0, 10, 16), "d": rng.rand(16).astype("f4")}
    y = rng.randint(0, 2, 16).astype("f4")
    m = WDL(cols, cols, dnn_hidden_units=(4,))
    m.compile("ftrl", "binary_crossentropy")
    m.fit(x, y, batch_size=8, epochs=1, verbose=0)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        m.learning_rate = m.learning_rate * 0.5
    assert any("not linear" in str(w.message) for w in rec)
