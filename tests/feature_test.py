"""Feature-column compiler tests (mirrors reference tests/feature_test.py)."""
import numpy as np
import pytest

from deepctr_tpu import DenseFeat, SparseFeat, VarLenSparseFeat, get_feature_names
from deepctr_tpu.models import DeepFM

from tests.utils import SAMPLE_SIZE, check_model


def test_long_dense_vector():
    feature_columns = [
        SparseFeat("user_id", 4),
        DenseFeat("pic_vec", 5),
    ]
    fixlen_feature_names = get_feature_names(feature_columns)
    assert fixlen_feature_names == ["user_id", "pic_vec"]

    user_id = np.array([[1], [0], [1]])
    pic_vec = np.array(
        [[0.1, 0.5, 0.4, 0.3, 0.2], [0.1, 0.5, 0.4, 0.3, 0.2], [0.1, 0.5, 0.4, 0.3, 0.2]]
    )
    label = np.array([1, 0, 1])

    input_dict = {"user_id": user_id, "pic_vec": pic_vec}
    model = DeepFM(feature_columns, feature_columns, dnn_hidden_units=(4,))
    model.compile("adam", "binary_crossentropy")
    model.fit(input_dict, label, batch_size=3, epochs=1, verbose=0)


def test_shared_embedding():
    """Columns sharing embedding_name must share one table."""
    fcs = [
        SparseFeat("a", 10, 4, embedding_name="shared"),
        SparseFeat("b", 10, 4, embedding_name="shared"),
        VarLenSparseFeat(SparseFeat("c", 10, 4, embedding_name="shared"), maxlen=3),
    ]
    from deepctr_tpu.inputs import build_embedding_plan

    plan = build_embedding_plan(fcs)
    assert list(plan.keys()) == ["shared"]


def test_incompatible_shared_embedding_raises():
    fcs = [
        SparseFeat("a", 10, 4, embedding_name="shared"),
        SparseFeat("b", 20, 4, embedding_name="shared"),
    ]
    from deepctr_tpu.inputs import build_embedding_plan

    with pytest.raises(ValueError):
        build_embedding_plan(fcs)


def test_auto_embedding_dim():
    fc = SparseFeat("a", 16, "auto")
    assert fc.embedding_dim == 6 * int(16 ** 0.25)


def test_string_dtype_requires_hash():
    with pytest.raises(ValueError):
        SparseFeat("a", 10, 4, dtype="string", use_hash=False)


def test_varlen_weight_and_length_inputs():
    fc = VarLenSparseFeat(
        SparseFeat("seq", 10, 4), maxlen=5, weight_name="w", length_name="len"
    )
    names = get_feature_names([fc])
    assert names == ["seq", "w", "len"]


def test_canonicalize_accepts_pandas_series():
    """Reference scripts often pass dict-of-Series (not .values); the
    batch canonicalizer must accept them."""
    import pandas as pd

    from deepctr_tpu.models import WDL

    df = pd.DataFrame({
        "c": np.random.randint(0, 50, 32),
        "d": np.random.rand(32),
        "y": np.random.randint(0, 2, 32),
    })
    cols = [SparseFeat("c", 50, 4), DenseFeat("d", 1)]
    m = WDL(cols, cols, dnn_hidden_units=(4,))
    m.compile("adam", "binary_crossentropy")
    h = m.fit({"c": df["c"], "d": df["d"]}, df["y"], batch_size=16,
              epochs=1, verbose=0)
    assert np.isfinite(h.history["loss"]).all()
    assert m.predict({"c": df["c"], "d": df["d"]}).shape == (32, 1)
