"""DCN / DCN-V2 (reference deepctr/models/dcn.py:22-78)."""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn

from ..inputs import EmbeddingTables, LinearLogit, fold_linear_split
from ..layers.core import DNN, PredictionLayer
from ..layers.interaction import CrossNet
from ..layers.utils import add_func, combined_dnn_input, concat_func
from ._common import DenseLogit, register, unified_feature_columns
from ..training.model import CTRModel


class DCNModule(nn.Module):
    linear_feature_columns: Tuple
    dnn_feature_columns: Tuple
    cross_num: int = 2
    cross_parameterization: str = "vector"
    dnn_hidden_units: Tuple[int, ...] = (256, 128, 64)
    l2_reg_linear: float = 1e-5
    l2_reg_embedding: float = 1e-5
    l2_reg_cross: float = 1e-5
    l2_reg_dnn: float = 0.0
    seed: int = 1024
    dnn_dropout: float = 0.0
    dnn_use_bn: bool = False
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
        dnn_input = combined_dnn_input(sparse_list, dense_list)
        units, cross = len(self.dnn_hidden_units), self.cross_num
        if units > 0 and cross > 0:
            deep_out = DNN(
                tuple(self.dnn_hidden_units), self.dnn_activation, self.l2_reg_dnn,
                self.dnn_dropout, self.dnn_use_bn, seed=self.seed, name="dnn",
            )(dnn_input, training=training)
            cross_out = CrossNet(
                cross, self.cross_parameterization, self.l2_reg_cross, name="crossnet"
            )(dnn_input)
            stack_out = concat_func([cross_out, deep_out])
            final_logit = DenseLogit(name="stack_logit")(stack_out)
        elif units > 0:
            deep_out = DNN(
                tuple(self.dnn_hidden_units), self.dnn_activation, self.l2_reg_dnn,
                self.dnn_dropout, self.dnn_use_bn, seed=self.seed, name="dnn",
            )(dnn_input, training=training)
            final_logit = DenseLogit(name="stack_logit")(deep_out)
        elif cross > 0:
            cross_out = CrossNet(
                cross, self.cross_parameterization, self.l2_reg_cross, name="crossnet"
            )(dnn_input)
            final_logit = DenseLogit(name="stack_logit")(cross_out)
        else:
            raise NotImplementedError
        final_logit = add_func([final_logit, linear_logit])
        return PredictionLayer(self.task)(final_logit)


@register
def DCN(linear_feature_columns, dnn_feature_columns, cross_num=2,
        cross_parameterization="vector", dnn_hidden_units=(256, 128, 64),
        l2_reg_linear=1e-5, l2_reg_embedding=1e-5, l2_reg_cross=1e-5, l2_reg_dnn=0,
        seed=1024, dnn_dropout=0, dnn_use_bn=False, dnn_activation="relu",
        task="binary"):
    """Instantiates DCN / DCN-V2 (same signature as reference dcn.py:22)."""
    if len(dnn_hidden_units) == 0 and cross_num == 0:
        raise ValueError("Either hidden_layer or cross layer must > 0")
    module = DCNModule(
        tuple(linear_feature_columns), tuple(dnn_feature_columns), cross_num,
        cross_parameterization, tuple(dnn_hidden_units), l2_reg_linear,
        l2_reg_embedding, l2_reg_cross, l2_reg_dnn, seed, dnn_dropout,
        dnn_use_bn, dnn_activation, task,
    )
    fcs = unified_feature_columns(linear_feature_columns, dnn_feature_columns)
    return CTRModel(module, fcs, task=task, seed=seed)
