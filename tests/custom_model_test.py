"""The docs/Custom-Models.md recipe, executed verbatim.

The reference documents model modularity ("use different modules to build
your own models", ref docs/source/Features.md:431); this test keeps our
custom-model guide true: the SENetFM example must run through the
standard check_model harness (fit -> save/load weights -> save/load whole
model via the factory registry -> prediction equality) and train under a
mesh.
"""
import flax.linen as nn
import jax
import numpy as np

from deepctr_tpu.inputs import EmbeddingTables, LinearLogit
from deepctr_tpu.layers.core import DNN, PredictionLayer
from deepctr_tpu.layers.interaction import FM, SENETLayer
from deepctr_tpu.layers.utils import add_func, combined_dnn_input, concat_func
from deepctr_tpu.models._common import (DenseLogit, FACTORY_REGISTRY,
                                        register, unified_feature_columns)
from deepctr_tpu.training.model import CTRModel

from .utils import check_model, get_test_data


# --- the docs/Custom-Models.md example, verbatim ---------------------------

class SENetFMModule(nn.Module):
    feature_columns: tuple
    dnn_hidden_units: tuple = (128, 64)
    reduction_ratio: int = 3
    l2_reg_embedding: float = 1e-5
    task: str = "binary"

    @nn.compact
    def __call__(self, features, training=False):
        tables = EmbeddingTables(self.feature_columns,
                                 self.l2_reg_embedding, name="embeddings")
        sparse_list, dense_list = tables(features)
        linear_logit = LinearLogit(self.feature_columns,
                                   name="linear")(features)

        reweighted = SENETLayer(self.reduction_ratio)(sparse_list, training)
        fm_logit = FM()(concat_func(reweighted, axis=1))

        dnn_out = DNN(tuple(self.dnn_hidden_units),
                      name="dnn")(combined_dnn_input(sparse_list, dense_list),
                                  training=training)
        dnn_logit = DenseLogit(name="dnn_logit")(dnn_out)

        return PredictionLayer(self.task)(
            add_func([linear_logit, fm_logit, dnn_logit]))


@register
def SENetFM(feature_columns, dnn_hidden_units=(128, 64), reduction_ratio=3,
            l2_reg_embedding=1e-5, task="binary", seed=1024):
    module = SENetFMModule(tuple(feature_columns), tuple(dnn_hidden_units),
                           reduction_ratio, l2_reg_embedding, task)
    fcs = unified_feature_columns(feature_columns)
    return CTRModel(module, fcs, task=task, seed=seed)


# ---------------------------------------------------------------------------

def test_custom_model_full_harness(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # harness writes checkpoint files
    x, y, cols = get_test_data(sample_size=200, sparse_feature_num=3,
                               dense_feature_num=2)
    model = SENetFM(cols, dnn_hidden_units=(16, 8))
    # load_model resolves user factories through the registry
    assert FACTORY_REGISTRY["SENetFM"] is SENetFM
    check_model(model, "SENetFM", x, y)


def test_custom_model_trains_under_mesh():
    from deepctr_tpu.parallel.mesh import make_mesh

    devices = jax.devices()
    if len(devices) < 8:
        import pytest
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh((4, 2), ("data", "model"), devices[:8])
    x, y, cols = get_test_data(sample_size=64, sparse_feature_num=3,
                               dense_feature_num=2)
    model = SENetFM(cols, dnn_hidden_units=(8,))
    model.compile("adam", "binary_crossentropy", mesh=mesh)
    hist = model.fit(x, y, batch_size=32, epochs=1, shuffle=False, verbose=0)
    assert np.isfinite(hist.history["loss"][-1])
