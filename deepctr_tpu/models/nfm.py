"""NFM (reference deepctr/models/nfm.py:19-61)."""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn

from ..inputs import EmbeddingTables, LinearLogit, fold_linear_split
from ..layers.core import DNN, PredictionLayer
from ..layers.interaction import BiInteractionPooling
from ..layers.utils import add_func, combined_dnn_input, concat_func
from ._common import DenseLogit, register, unified_feature_columns
from ..training.model import CTRModel


class NFMModule(nn.Module):
    linear_feature_columns: Tuple
    dnn_feature_columns: Tuple
    dnn_hidden_units: Tuple[int, ...] = (256, 128, 64)
    l2_reg_embedding: float = 1e-5
    l2_reg_linear: float = 1e-5
    l2_reg_dnn: float = 0.0
    seed: int = 1024
    bi_dropout: float = 0.0
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
        fm_input = concat_func(sparse_list, axis=1)
        bi_out = BiInteractionPooling()(fm_input)
        if self.bi_dropout:
            bi_out = nn.Dropout(rate=self.bi_dropout, deterministic=not training)(bi_out)
        dnn_input = combined_dnn_input([bi_out], dense_list)
        dnn_out = DNN(
            tuple(self.dnn_hidden_units), self.dnn_activation, self.l2_reg_dnn,
            self.dnn_dropout, False, seed=self.seed, name="dnn",
        )(dnn_input, training=training)
        dnn_logit = DenseLogit(name="dnn_logit")(dnn_out)
        final_logit = add_func([linear_logit, dnn_logit])
        return PredictionLayer(self.task)(final_logit)


@register
def NFM(linear_feature_columns, dnn_feature_columns, dnn_hidden_units=(256, 128, 64),
        l2_reg_embedding=1e-5, l2_reg_linear=1e-5, l2_reg_dnn=0, seed=1024,
        bi_dropout=0, dnn_dropout=0, dnn_activation="relu", task="binary"):
    """Instantiates NFM (same signature as reference nfm.py:19)."""
    module = NFMModule(
        tuple(linear_feature_columns), tuple(dnn_feature_columns),
        tuple(dnn_hidden_units), l2_reg_embedding, l2_reg_linear, l2_reg_dnn,
        seed, bi_dropout, dnn_dropout, dnn_activation, task,
    )
    fcs = unified_feature_columns(linear_feature_columns, dnn_feature_columns)
    return CTRModel(module, fcs, task=task, seed=seed)
