"""FwFM (reference deepctr/models/fwfm.py:24-72)."""
from __future__ import annotations

from itertools import chain
from typing import Any, Tuple

import flax.linen as nn

from ..features import DEFAULT_GROUP_NAME
from ..inputs import EmbeddingTables, LinearLogit, fold_linear_split
from ..layers.core import DNN, PredictionLayer
from ..layers.interaction import FwFMLayer
from ..layers.utils import add_func, combined_dnn_input, concat_func
from ._common import DenseLogit, register, unified_feature_columns
from ..training.model import CTRModel


class FwFMModule(nn.Module):
    linear_feature_columns: Tuple
    dnn_feature_columns: Tuple
    fm_group: Tuple[str, ...] = (DEFAULT_GROUP_NAME,)
    dnn_hidden_units: Tuple[int, ...] = (256, 128, 64)
    l2_reg_linear: float = 1e-5
    l2_reg_embedding: float = 1e-5
    l2_reg_field_strength: float = 1e-5
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
        fwfm_logit = add_func([
            FwFMLayer(num_fields=len(v), regularizer=self.l2_reg_field_strength,
                      name="fwfm_" + k)(concat_func(v, axis=1))
            for k, v in group_embedding_dict.items()
            if k in self.fm_group and len(v) > 1
        ])
        components = [linear_logit, fwfm_logit]
        if self.dnn_hidden_units:
            dnn_input = combined_dnn_input(
                list(chain.from_iterable(group_embedding_dict.values())), dense_list
            )
            dnn_out = DNN(
                tuple(self.dnn_hidden_units), self.dnn_activation, self.l2_reg_dnn,
                self.dnn_dropout, self.dnn_use_bn, seed=self.seed, name="dnn",
            )(dnn_input, training=training)
            components.append(DenseLogit(name="dnn_logit")(dnn_out))
        return PredictionLayer(self.task)(add_func(components))


@register
def FwFM(linear_feature_columns, dnn_feature_columns, fm_group=(DEFAULT_GROUP_NAME,),
         dnn_hidden_units=(256, 128, 64), l2_reg_linear=1e-5, l2_reg_embedding=1e-5,
         l2_reg_field_strength=1e-5, l2_reg_dnn=0, seed=1024, dnn_dropout=0,
         dnn_activation="relu", dnn_use_bn=False, task="binary"):
    """Instantiates FwFM (same signature as reference fwfm.py:24)."""
    if isinstance(fm_group, str):
        fm_group = (fm_group,)
    module = FwFMModule(
        tuple(linear_feature_columns), tuple(dnn_feature_columns), tuple(fm_group),
        tuple(dnn_hidden_units), l2_reg_linear, l2_reg_embedding,
        l2_reg_field_strength, l2_reg_dnn, seed, dnn_dropout, dnn_activation,
        dnn_use_bn, task,
    )
    fcs = unified_feature_columns(linear_feature_columns, dnn_feature_columns)
    return CTRModel(module, fcs, task=task, seed=seed)
