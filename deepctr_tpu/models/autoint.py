"""AutoInt (reference deepctr/models/autoint.py:22-84)."""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn

from ..inputs import EmbeddingTables, LinearLogit, fold_linear_split
from ..layers.core import DNN, PredictionLayer
from ..layers.interaction import InteractingLayer
from ..layers.utils import add_func, combined_dnn_input, concat_func, flatten
from ._common import DenseLogit, register, unified_feature_columns
from ..training.model import CTRModel


class AutoIntModule(nn.Module):
    linear_feature_columns: Tuple
    dnn_feature_columns: Tuple
    att_layer_num: int = 3
    att_embedding_size: int = 8
    att_head_num: int = 2
    att_res: bool = True
    dnn_hidden_units: Tuple[int, ...] = (256, 128, 64)
    dnn_activation: Any = "relu"
    l2_reg_linear: float = 1e-5
    l2_reg_embedding: float = 1e-5
    l2_reg_dnn: float = 0.0
    dnn_use_bn: bool = False
    dnn_dropout: float = 0.0
    seed: int = 1024
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
        att_input = concat_func(sparse_list, axis=1)
        for i in range(self.att_layer_num):
            att_input = InteractingLayer(
                self.att_embedding_size, self.att_head_num, self.att_res,
                name="interacting_%d" % i,
            )(att_input)
        att_output = flatten(att_input)
        dnn_input = combined_dnn_input(sparse_list, dense_list)
        units, att_n = len(self.dnn_hidden_units), self.att_layer_num
        if units > 0 and att_n > 0:
            deep_out = DNN(
                tuple(self.dnn_hidden_units), self.dnn_activation, self.l2_reg_dnn,
                self.dnn_dropout, self.dnn_use_bn, seed=self.seed, name="dnn",
            )(dnn_input, training=training)
            final_logit = DenseLogit(name="stack_logit")(
                concat_func([att_output, deep_out])
            )
        elif units > 0:
            deep_out = DNN(
                tuple(self.dnn_hidden_units), self.dnn_activation, self.l2_reg_dnn,
                self.dnn_dropout, self.dnn_use_bn, seed=self.seed, name="dnn",
            )(dnn_input, training=training)
            final_logit = DenseLogit(name="stack_logit")(deep_out)
        elif att_n > 0:
            final_logit = DenseLogit(name="stack_logit")(att_output)
        else:
            raise NotImplementedError
        final_logit = add_func([final_logit, linear_logit])
        return PredictionLayer(self.task)(final_logit)


@register
def AutoInt(linear_feature_columns, dnn_feature_columns, att_layer_num=3,
            att_embedding_size=8, att_head_num=2, att_res=True,
            dnn_hidden_units=(256, 128, 64), dnn_activation="relu",
            l2_reg_linear=1e-5, l2_reg_embedding=1e-5, l2_reg_dnn=0,
            dnn_use_bn=False, dnn_dropout=0, seed=1024, task="binary"):
    """Instantiates AutoInt (same signature as reference autoint.py:22)."""
    if len(dnn_hidden_units) <= 0 and att_layer_num <= 0:
        raise ValueError("Either hidden_layer or att_layer_num must > 0")
    module = AutoIntModule(
        tuple(linear_feature_columns), tuple(dnn_feature_columns), att_layer_num,
        att_embedding_size, att_head_num, att_res, tuple(dnn_hidden_units),
        dnn_activation, l2_reg_linear, l2_reg_embedding, l2_reg_dnn, dnn_use_bn,
        dnn_dropout, seed, task,
    )
    fcs = unified_feature_columns(linear_feature_columns, dnn_feature_columns)
    return CTRModel(module, fcs, task=task, seed=seed)
