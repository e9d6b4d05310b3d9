"""FLEN (reference deepctr/models/flen.py:25-81). Relies on group_name."""
from __future__ import annotations

from itertools import chain
from typing import Any, Tuple

import flax.linen as nn

from ..inputs import EmbeddingTables, LinearLogit, fold_linear_split
from ..layers.core import DNN, PredictionLayer
from ..layers.interaction import FieldWiseBiInteraction
from ..layers.utils import add_func, combined_dnn_input, concat_func
from ._common import DenseLogit, register, unified_feature_columns
from ..training.model import CTRModel


class FLENModule(nn.Module):
    linear_feature_columns: Tuple
    dnn_feature_columns: Tuple
    dnn_hidden_units: Tuple[int, ...] = (256, 128, 64)
    l2_reg_linear: float = 1e-5
    l2_reg_embedding: float = 1e-5
    l2_reg_dnn: float = 0.0
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
        group_embedding_dict, dense_list, lin_vals = tables(features, support_group=True, return_linear=True)
        linear_logit = LinearLogit(
            lin_rest, l2_reg=self.l2_reg_linear, name="linear"
        )(features, extra_sparse=lin_vals)
        fm_mf_out = FieldWiseBiInteraction(seed=self.seed, name="fwbi")(
            [concat_func(v, axis=1) for k, v in group_embedding_dict.items()]
        )
        dnn_input = combined_dnn_input(
            list(chain.from_iterable(group_embedding_dict.values())), dense_list
        )
        dnn_output = DNN(
            tuple(self.dnn_hidden_units), self.dnn_activation, self.l2_reg_dnn,
            self.dnn_dropout, self.dnn_use_bn, seed=self.seed, name="dnn",
        )(dnn_input, training=training)
        dnn_logit = DenseLogit(name="dnn_logit")(
            concat_func([fm_mf_out, dnn_output])
        )
        return PredictionLayer(self.task)(add_func([linear_logit, dnn_logit]))


@register
def FLEN(linear_feature_columns, dnn_feature_columns, dnn_hidden_units=(256, 128, 64),
         l2_reg_linear=1e-5, l2_reg_embedding=1e-5, l2_reg_dnn=0, seed=1024,
         dnn_dropout=0.0, dnn_activation="relu", dnn_use_bn=False, task="binary"):
    """Instantiates FLEN (same signature as reference flen.py:25)."""
    module = FLENModule(
        tuple(linear_feature_columns), tuple(dnn_feature_columns),
        tuple(dnn_hidden_units), l2_reg_linear, l2_reg_embedding, l2_reg_dnn,
        seed, dnn_dropout, dnn_activation, dnn_use_bn, task,
    )
    fcs = unified_feature_columns(linear_feature_columns, dnn_feature_columns)
    return CTRModel(module, fcs, task=task, seed=seed)
