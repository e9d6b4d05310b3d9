"""FiBiNET (reference deepctr/models/fibinet.py:20-66)."""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn

from ..inputs import EmbeddingTables, LinearLogit, fold_linear_split
from ..layers.core import DNN, PredictionLayer
from ..layers.interaction import BilinearInteraction, SENETLayer
from ..layers.utils import add_func, combined_dnn_input, concat_func, flatten
from ._common import DenseLogit, register, unified_feature_columns
from ..training.model import CTRModel


class FiBiNETModule(nn.Module):
    linear_feature_columns: Tuple
    dnn_feature_columns: Tuple
    bilinear_type: str = "interaction"
    reduction_ratio: int = 3
    dnn_hidden_units: Tuple[int, ...] = (256, 128, 64)
    l2_reg_linear: float = 1e-5
    l2_reg_embedding: float = 1e-5
    l2_reg_dnn: float = 0.0
    seed: int = 1024
    dnn_dropout: float = 0.0
    dnn_activation: Any = "relu"
    task: str = "binary"

    @nn.compact
    def __call__(self, features, training: bool = False):
        folded, lin_rest = fold_linear_split(
            self.linear_feature_columns, self.dnn_feature_columns)
        tables = EmbeddingTables(
            self.dnn_feature_columns, self.l2_reg_embedding,
            linear_columns=folded, linear_l2=self.l2_reg_linear,
            name="embeddings",
        )
        sparse_list, dense_list, lin_vals = tables(features, return_linear=True)
        linear_logit = LinearLogit(
            lin_rest, l2_reg=self.l2_reg_linear, name="linear"
        )(features, extra_sparse=lin_vals)
        senet_list = SENETLayer(self.reduction_ratio, self.seed, name="senet")(
            sparse_list
        )
        senet_bilinear_out = BilinearInteraction(
            self.bilinear_type, self.seed, name="senet_bilinear"
        )(senet_list)
        bilinear_out = BilinearInteraction(
            self.bilinear_type, self.seed, name="bilinear"
        )(sparse_list)
        dnn_input = combined_dnn_input(
            [flatten(concat_func([senet_bilinear_out, bilinear_out]))], dense_list
        )
        dnn_out = DNN(
            tuple(self.dnn_hidden_units), self.dnn_activation, self.l2_reg_dnn,
            self.dnn_dropout, False, seed=self.seed, name="dnn",
        )(dnn_input, training=training)
        dnn_logit = DenseLogit(name="dnn_logit")(dnn_out)
        return PredictionLayer(self.task)(add_func([linear_logit, dnn_logit]))


@register
def FiBiNET(linear_feature_columns, dnn_feature_columns, bilinear_type="interaction",
            reduction_ratio=3, dnn_hidden_units=(256, 128, 64), l2_reg_linear=1e-5,
            l2_reg_embedding=1e-5, l2_reg_dnn=0, seed=1024, dnn_dropout=0,
            dnn_activation="relu", task="binary"):
    """Instantiates FiBiNET (same signature as reference fibinet.py:20)."""
    module = FiBiNETModule(
        tuple(linear_feature_columns), tuple(dnn_feature_columns), bilinear_type,
        reduction_ratio, tuple(dnn_hidden_units), l2_reg_linear, l2_reg_embedding,
        l2_reg_dnn, seed, dnn_dropout, dnn_activation, task,
    )
    fcs = unified_feature_columns(linear_feature_columns, dnn_feature_columns)
    return CTRModel(module, fcs, task=task, seed=seed)
