"""FNN (reference deepctr/models/fnn.py:18-49)."""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn

from ..inputs import EmbeddingTables
from ..layers.core import DNN, PredictionLayer
from ..layers.utils import combined_dnn_input
from ._common import DenseLogit, register, unified_feature_columns
from ..training.model import CTRModel


class FNNModule(nn.Module):
    linear_feature_columns: Tuple
    dnn_feature_columns: Tuple
    dnn_hidden_units: Tuple[int, ...] = (256, 128, 64)
    l2_reg_embedding: float = 1e-5
    l2_reg_linear: float = 1e-5
    l2_reg_dnn: float = 0.0
    seed: int = 1024
    dnn_dropout: float = 0.0
    dnn_activation: Any = "relu"
    task: str = "binary"

    @nn.compact
    def __call__(self, features, training: bool = False):
        sparse_list, dense_list = EmbeddingTables(
            self.dnn_feature_columns, self.l2_reg_embedding, name="embeddings"
        )(features)
        dnn_input = combined_dnn_input(sparse_list, dense_list)
        deep_out = DNN(
            tuple(self.dnn_hidden_units), self.dnn_activation, self.l2_reg_dnn,
            self.dnn_dropout, False, seed=self.seed, name="dnn",
        )(dnn_input, training=training)
        dnn_logit = DenseLogit(name="dnn_logit")(deep_out)
        return PredictionLayer(self.task)(dnn_logit)


@register
def FNN(linear_feature_columns, dnn_feature_columns, dnn_hidden_units=(256, 128, 64),
        l2_reg_embedding=1e-5, l2_reg_linear=1e-5, l2_reg_dnn=0, seed=1024,
        dnn_dropout=0, dnn_activation="relu", task="binary"):
    """Instantiates FNN (same signature as reference fnn.py:18). The
    linear_feature_columns are kept for API compatibility only, exactly like
    the reference."""
    module = FNNModule(
        tuple(linear_feature_columns), tuple(dnn_feature_columns),
        tuple(dnn_hidden_units), l2_reg_embedding, l2_reg_linear, l2_reg_dnn,
        seed, dnn_dropout, dnn_activation, task,
    )
    fcs = unified_feature_columns(linear_feature_columns, dnn_feature_columns)
    return CTRModel(module, fcs, task=task, seed=seed)
