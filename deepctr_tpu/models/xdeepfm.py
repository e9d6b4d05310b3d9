"""xDeepFM (reference deepctr/models/xdeepfm.py:21-70)."""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn

from ..inputs import EmbeddingTables, LinearLogit, fold_linear_split
from ..layers.core import DNN, PredictionLayer
from ..layers.interaction import CIN
from ..layers.utils import add_func, combined_dnn_input, concat_func
from ._common import DenseLogit, register, unified_feature_columns
from ..training.model import CTRModel


class XDeepFMModule(nn.Module):
    linear_feature_columns: Tuple
    dnn_feature_columns: Tuple
    dnn_hidden_units: Tuple[int, ...] = (256, 128, 64)
    cin_layer_size: Tuple[int, ...] = (128, 128)
    cin_split_half: bool = True
    cin_activation: Any = "relu"
    l2_reg_linear: float = 1e-5
    l2_reg_embedding: float = 1e-5
    l2_reg_dnn: float = 0.0
    l2_reg_cin: float = 0.0
    seed: int = 1024
    dnn_dropout: float = 0.0
    dnn_activation: Any = "relu"
    dnn_use_bn: bool = False
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
        fm_input = concat_func(sparse_list, axis=1)
        dnn_input = combined_dnn_input(sparse_list, dense_list)
        dnn_output = DNN(
            tuple(self.dnn_hidden_units), self.dnn_activation, self.l2_reg_dnn,
            self.dnn_dropout, self.dnn_use_bn, seed=self.seed, name="dnn",
        )(dnn_input, training=training)
        dnn_logit = DenseLogit(name="dnn_logit")(dnn_output)
        final_logit = add_func([linear_logit, dnn_logit])
        if len(self.cin_layer_size) > 0:
            exFM_out = CIN(
                tuple(self.cin_layer_size), self.cin_activation,
                self.cin_split_half, self.l2_reg_cin, self.seed, name="cin",
            )(fm_input, training=training)
            exFM_logit = DenseLogit(name="cin_logit")(exFM_out)
            final_logit = add_func([final_logit, exFM_logit])
        return PredictionLayer(self.task)(final_logit)


@register
def xDeepFM(linear_feature_columns, dnn_feature_columns,
            dnn_hidden_units=(256, 128, 64), cin_layer_size=(128, 128),
            cin_split_half=True, cin_activation="relu", l2_reg_linear=1e-5,
            l2_reg_embedding=1e-5, l2_reg_dnn=0, l2_reg_cin=0, seed=1024,
            dnn_dropout=0, dnn_activation="relu", dnn_use_bn=False, task="binary"):
    """Instantiates xDeepFM (same signature as reference xdeepfm.py:21)."""
    module = XDeepFMModule(
        tuple(linear_feature_columns), tuple(dnn_feature_columns),
        tuple(dnn_hidden_units), tuple(cin_layer_size), cin_split_half,
        cin_activation, l2_reg_linear, l2_reg_embedding, l2_reg_dnn, l2_reg_cin,
        seed, dnn_dropout, dnn_activation, dnn_use_bn, task,
    )
    fcs = unified_feature_columns(linear_feature_columns, dnn_feature_columns)
    return CTRModel(module, fcs, task=task, seed=seed)
