"""PNN (reference deepctr/models/pnn.py:20-72)."""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn

from ..inputs import EmbeddingTables
from ..layers.core import DNN, PredictionLayer
from ..layers.interaction import InnerProductLayer, OutterProductLayer
from ..layers.utils import combined_dnn_input, concat_func, flatten
from ._common import DenseLogit, register, unified_feature_columns
from ..training.model import CTRModel


class PNNModule(nn.Module):
    dnn_feature_columns: Tuple
    dnn_hidden_units: Tuple[int, ...] = (256, 128, 64)
    l2_reg_embedding: float = 1e-5
    l2_reg_dnn: float = 0.0
    seed: int = 1024
    dnn_dropout: float = 0.0
    dnn_activation: Any = "relu"
    use_inner: bool = True
    use_outter: bool = False
    kernel_type: str = "mat"
    task: str = "binary"

    @nn.compact
    def __call__(self, features, training: bool = False):
        sparse_list, dense_list = EmbeddingTables(
            self.dnn_feature_columns, self.l2_reg_embedding, name="embeddings"
        )(features)
        linear_signal = flatten(concat_func(sparse_list, axis=1))
        parts = [linear_signal]
        if self.use_inner:
            parts.append(flatten(InnerProductLayer()(sparse_list)))
        if self.use_outter:
            parts.append(OutterProductLayer(self.kernel_type)(sparse_list))
        deep_input = concat_func(parts)
        dnn_input = combined_dnn_input([deep_input], dense_list)
        dnn_out = DNN(
            tuple(self.dnn_hidden_units), self.dnn_activation, self.l2_reg_dnn,
            self.dnn_dropout, False, seed=self.seed, name="dnn",
        )(dnn_input, training=training)
        dnn_logit = DenseLogit(name="dnn_logit")(dnn_out)
        return PredictionLayer(self.task)(dnn_logit)


@register
def PNN(dnn_feature_columns, dnn_hidden_units=(256, 128, 64), l2_reg_embedding=1e-5,
        l2_reg_dnn=0, seed=1024, dnn_dropout=0, dnn_activation="relu",
        use_inner=True, use_outter=False, kernel_type="mat", task="binary"):
    """Instantiates PNN (same signature as reference pnn.py:20)."""
    if kernel_type not in ("mat", "vec", "num"):
        raise ValueError("kernel_type must be mat,vec or num")
    module = PNNModule(
        tuple(dnn_feature_columns), tuple(dnn_hidden_units), l2_reg_embedding,
        l2_reg_dnn, seed, dnn_dropout, dnn_activation, use_inner, use_outter,
        kernel_type, task,
    )
    fcs = unified_feature_columns(dnn_feature_columns)
    return CTRModel(module, fcs, task=task, seed=seed)
