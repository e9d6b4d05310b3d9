"""The reference's functional custom-model API, exercised end-to-end.

Reference users build custom models from input_from_feature_columns /
get_linear_logit / embedding_lookup / get_varlen_pooling_list etc.
(reference feature_column.py:171-233, inputs.py:40-158; every reference
model body is written in exactly this style). These tests prove the
compat names do real work on our funnel — a model written in the
reference idiom trains, and the container behaves like the reference's
dict-of-Embedding (shared tables included).
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepctr_tpu import SparseFeat, VarLenSparseFeat, DenseFeat
from deepctr_tpu.feature_column import (
    get_linear_logit,
    input_from_feature_columns,
)
from deepctr_tpu.inputs import (
    Embedding,
    create_embedding_dict,
    create_embedding_matrix,
    embedding_lookup,
    get_embedding_vec_list,
    get_inputs_list,
    get_varlen_pooling_list,
    varlen_embedding_lookup,
)
from deepctr_tpu.layers.core import DNN, PredictionLayer
from deepctr_tpu.layers.utils import add_func, combined_dnn_input
from deepctr_tpu.models._common import DenseLogit, unified_feature_columns
from deepctr_tpu.training.model import CTRModel

from .utils import get_test_data


class RefStyleModule(nn.Module):
    """A custom model written the way the reference's own model bodies are
    (e.g. reference wdl.py:47-64): functional toolkit, no EmbeddingTables
    in sight."""

    linear_feature_columns: tuple
    dnn_feature_columns: tuple
    task: str = "binary"

    @nn.compact
    def __call__(self, features, training=False):
        linear_logit = get_linear_logit(features, self.linear_feature_columns,
                                        l2_reg=1e-5, prefix="linear")
        sparse_list, dense_list = input_from_feature_columns(
            features, self.dnn_feature_columns, l2_reg=1e-5)
        dnn_out = DNN((16, 8), name="dnn")(
            combined_dnn_input(sparse_list, dense_list), training=training)
        dnn_logit = DenseLogit(name="dnn_logit")(dnn_out)
        return PredictionLayer(self.task)(add_func([linear_logit, dnn_logit]))


def test_reference_idiom_model_trains():
    x, y, cols = get_test_data(sample_size=200, sparse_feature_num=3,
                               dense_feature_num=2)
    module = RefStyleModule(tuple(cols), tuple(cols))
    model = CTRModel(module, unified_feature_columns(cols), task="binary")
    model.compile("adam", "binary_crossentropy")
    hist = model.fit(x, y, batch_size=64, epochs=1, verbose=0)
    assert np.isfinite(hist.history["loss"][-1])
    preds = model.predict(x, batch_size=64)
    assert preds.shape[0] == 200 and np.isfinite(preds).all()


class LookupToolkitModule(nn.Module):
    """Exercises the lower-level container API the way reference DIN-family
    bodies do: explicit embedding dict + per-name lookups."""

    feature_columns: tuple

    @nn.compact
    def __call__(self, features, training=False):
        sparse_cols = [fc for fc in self.feature_columns
                       if isinstance(fc, SparseFeat)]
        varlen_cols = [fc for fc in self.feature_columns
                       if isinstance(fc, VarLenSparseFeat)]
        tables = create_embedding_matrix(self.feature_columns, l2_reg=1e-5)

        # grouped lookups + pooling (reference inputs.py:101-158)
        group = embedding_lookup(tables, features, sparse_cols)
        pooled = get_varlen_pooling_list(tables, features, varlen_cols,
                                         to_list=True)
        flat = [v for vs in group.values() for v in vs] + pooled

        # raw sequence lookup (reference inputs.py:120-130)
        seq = varlen_embedding_lookup(tables, features, varlen_cols)
        assert all(v.ndim == 3 for v in seq.values())

        # per-feature vec list + dict-style single-table access
        vec_list = get_embedding_vec_list(tables, features, sparse_cols)
        assert len(vec_list) == len(sparse_cols)

        dnn_in = combined_dnn_input(flat, [])
        out = DNN((8,), name="dnn")(dnn_in, training=training)
        return PredictionLayer("binary")(DenseLogit(name="logit")(out))


def test_lookup_toolkit_trains():
    x, y, cols = get_test_data(sample_size=120, sparse_feature_num=3,
                               dense_feature_num=0, sequence_feature=("sum",))
    module = LookupToolkitModule(tuple(cols))
    model = CTRModel(module, unified_feature_columns(cols), task="binary")
    model.compile("adam", "binary_crossentropy")
    hist = model.fit(x, y, batch_size=40, epochs=1, verbose=0)
    assert np.isfinite(hist.history["loss"][-1])


def test_shared_table_dict_access_dedupes():
    """Two columns sharing embedding_name resolve to ONE table through the
    dict-style access (reference create_embedding_dict dedup semantics)."""
    cols = (
        SparseFeat("a", 50, embedding_dim=4, embedding_name="shared"),
        SparseFeat("b", 50, embedding_dim=4, embedding_name="shared"),
    )

    class M(nn.Module):
        @nn.compact
        def __call__(self, features):
            tables = create_embedding_dict(cols, (), 1024, 1e-5)
            va = tables["shared"](features["a"])
            vb = tables["shared"](features["b"])
            return va + vb

    feats = {"a": jnp.array([1, 2]), "b": jnp.array([1, 2])}
    params = M().init(jax.random.PRNGKey(0), feats)
    leaves = jax.tree_util.tree_leaves_with_path(params)
    emb_paths = [jax.tree_util.keystr(p) for p, _ in leaves if "emb_" in
                 jax.tree_util.keystr(p)]
    assert len(emb_paths) == 1, emb_paths
    out = M().apply(params, feats)
    # same ids through the same shared table -> identical rows
    np.testing.assert_allclose(out, 2 * M().apply(params, feats) / 2)


def test_embedding_shim_and_inputs_list():
    class M(nn.Module):
        @nn.compact
        def __call__(self, ids):
            return Embedding(10, 4)(ids)

    ids = jnp.array([[1], [2]])
    m = M()
    params = m.init(jax.random.PRNGKey(0), ids)
    out = m.apply(params, ids)
    assert out.shape == (2, 1, 4)

    lst = get_inputs_list([{"a": 1, "b": 2}, None, {"c": 3}])
    assert lst == [1, 2, 3]


def test_incompatible_shared_table_raises():
    cols = (
        SparseFeat("a", 50, embedding_dim=4, embedding_name="shared"),
        SparseFeat("b", 50, embedding_dim=8, embedding_name="shared"),
    )

    class M(nn.Module):
        @nn.compact
        def __call__(self, features):
            tables = create_embedding_matrix(cols, l2_reg=0.0)
            return tables(features)

    feats = {"a": jnp.array([1]), "b": jnp.array([1])}
    with pytest.raises(ValueError, match="same embedding_name"):
        M().init(jax.random.PRNGKey(0), feats)


def test_varlen_pooling_from_lookup_dict():
    """Reference convention ported verbatim: get_varlen_pooling_list over
    the dict returned by varlen_embedding_lookup (reference inputs.py:133
    indexes embedding_dict[feature_name] tensors) — must match the
    tables-first fast path bit-for-bit."""
    x, y, cols = get_test_data(sample_size=60, sparse_feature_num=1,
                               dense_feature_num=0, sequence_feature=("mean",))
    varlen_cols = tuple(fc for fc in cols if isinstance(fc, VarLenSparseFeat))
    assert varlen_cols

    class M(nn.Module):
        @nn.compact
        def __call__(self, features):
            tables = create_embedding_matrix(cols, l2_reg=0.0)
            seq = varlen_embedding_lookup(tables, features, varlen_cols)
            via_dict = get_varlen_pooling_list(seq, features, varlen_cols,
                                               to_list=True)
            via_tables = get_varlen_pooling_list(tables, features,
                                                 varlen_cols, to_list=True)
            return via_dict[0], via_tables[0]

    from deepctr_tpu.features import canonicalize_batch
    feats = {k: jnp.asarray(v) for k, v in
             canonicalize_batch(x, list(cols)).items()}
    m = M()
    params = m.init(jax.random.PRNGKey(0), feats)
    a, b = m.apply(params, feats)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_get_linear_logit_refine_weight():
    """sparse_feat_refine_weight passthrough (reference
    feature_column.py:171; IFM/DIFM custom-model idiom)."""
    cols = (SparseFeat("a", 20, embedding_dim=4),
            SparseFeat("b", 20, embedding_dim=4))

    class M(nn.Module):
        @nn.compact
        def __call__(self, features, w):
            return get_linear_logit(features, cols,
                                    sparse_feat_refine_weight=w)

    feats = {"a": jnp.array([[1], [2]]), "b": jnp.array([[3], [4]])}
    w = jnp.array([[2.0, 2.0], [0.5, 0.5]])
    m = M()
    params = m.init(jax.random.PRNGKey(0), feats, w)
    out_w = m.apply(params, feats, w)
    out_1 = m.apply(params, feats, jnp.ones_like(w))
    assert out_w.shape == (2, 1)
    # refine weight 2.0 doubles the sparse contribution of row 0
    np.testing.assert_allclose(np.asarray(out_w[0]), 2 * np.asarray(out_1[0]),
                               rtol=1e-6)


def test_estimator_tier_functional_contracts():
    """Reference estimator-tier signatures over shim columns
    (estimator/feature_column.py:15-44): l2_reg_linear / l2_reg_embedding
    keywords, tf.feature_column-style inputs accepted directly."""
    from deepctr_tpu.estimator import feature_column as efc
    from deepctr_tpu.feature_column import (
        categorical_column_with_identity, embedding_column, numeric_column)

    cat = categorical_column_with_identity("c1", num_buckets=20)
    emb = embedding_column(cat, 4)
    num = numeric_column("d1")

    class M(nn.Module):
        @nn.compact
        def __call__(self, features):
            lin = efc.get_linear_logit(features, [cat, num],
                                       l2_reg_linear=1e-5)
            sparse_list, dense_list = efc.input_from_feature_columns(
                features, [emb, num], l2_reg_embedding=1e-5)
            return lin, sparse_list, dense_list

    feats = {"c1": jnp.array([1, 2, 3]), "d1": jnp.ones((3, 1))}
    m = M()
    params = m.init(jax.random.PRNGKey(0), feats)
    lin, sparse_list, dense_list = m.apply(params, feats)
    assert lin.shape == (3, 1)
    assert len(sparse_list) == 1 and sparse_list[0].shape == (3, 1, 4)
    assert len(dense_list) == 1


def test_custom_objects_tf_entry():
    """custom_objects['tf'] lazily resolves to the tensorflow module
    (reference utils.py custom_objects maps it eagerly)."""
    from deepctr_tpu.layers import custom_objects

    tf = custom_objects["tf"]
    assert tf is not None and hasattr(tf, "constant")


def test_estimator_feature_column_glue():
    """estimator.feature_column compat module (reference
    estimator/feature_column.py): is_embedding over shim columns and
    linear_model inside a flax context."""
    from deepctr_tpu.estimator import feature_column as efc
    from deepctr_tpu.feature_column import (
        categorical_column_with_identity, embedding_column, numeric_column)

    cat = categorical_column_with_identity("c1", num_buckets=20)
    emb = embedding_column(cat, 4)
    num = numeric_column("d1")
    assert efc.is_embedding(emb)
    assert not efc.is_embedding(cat) and not efc.is_embedding(num)

    class M(nn.Module):
        @nn.compact
        def __call__(self, features):
            return efc.linear_model(features, [cat, num])

    feats = {"c1": jnp.array([1, 2, 3]), "d1": jnp.ones((3, 1))}
    m = M()
    params = m.init(jax.random.PRNGKey(0), feats)
    out = m.apply(params, feats)
    assert out.shape == (3, 1)
