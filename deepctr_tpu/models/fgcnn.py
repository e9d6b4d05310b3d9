"""FGCNN (reference deepctr/models/fgcnn.py:30-89). Uses two embedding sets:
the origin set and a separate 'fg' set consumed by the feature-generation CNN.
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn

from ..inputs import EmbeddingTables, LinearLogit, fold_linear_split
from ..layers.core import DNN, PredictionLayer
from ..layers.interaction import FGCNNLayer, InnerProductLayer
from ..layers.utils import add_func, concat_func, flatten
from ._common import DenseLogit, register, unified_feature_columns
from ..training.model import CTRModel


class FGCNNModule(nn.Module):
    linear_feature_columns: Tuple
    dnn_feature_columns: Tuple
    conv_kernel_width: Tuple[int, ...] = (7, 7, 7, 7)
    conv_filters: Tuple[int, ...] = (14, 16, 18, 20)
    new_maps: Tuple[int, ...] = (3, 3, 3, 3)
    pooling_width: Tuple[int, ...] = (2, 2, 2, 2)
    dnn_hidden_units: Tuple[int, ...] = (256, 128, 64)
    l2_reg_linear: float = 1e-5
    l2_reg_embedding: float = 1e-5
    l2_reg_dnn: float = 0.0
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
        deep_emb_list, _, lin_vals = tables(features, return_linear=True)
        linear_logit = LinearLogit(
            lin_rest, l2_reg=self.l2_reg_linear, name="linear"
        )(features, extra_sparse=lin_vals)
        fg_deep_emb_list, _ = EmbeddingTables(
            self.dnn_feature_columns, self.l2_reg_embedding, prefix="fg",
            name="fg_embeddings",
        )(features)
        origin_input = concat_func(deep_emb_list, axis=1)  # (B, F, E)
        fg_input = concat_func(fg_deep_emb_list, axis=1)
        if len(self.conv_filters) > 0:
            new_features = FGCNNLayer(
                tuple(self.conv_filters), tuple(self.conv_kernel_width),
                tuple(self.new_maps), tuple(self.pooling_width), name="fgcnn",
            )(fg_input)
            combined_input = concat_func([origin_input, new_features], axis=1)
        else:
            combined_input = origin_input
        inner_product = flatten(InnerProductLayer()(combined_input))
        linear_signal = flatten(combined_input)
        dnn_input = concat_func([linear_signal, inner_product])
        dnn_out = DNN(
            tuple(self.dnn_hidden_units), "relu", self.l2_reg_dnn,
            self.dnn_dropout, False, seed=self.seed, name="dnn",
        )(dnn_input, training=training)
        final_logit = DenseLogit(name="dnn_logit")(dnn_out)
        final_logit = add_func([final_logit, linear_logit])
        return PredictionLayer(self.task)(final_logit)


@register
def FGCNN(linear_feature_columns, dnn_feature_columns, conv_kernel_width=(7, 7, 7, 7),
          conv_filters=(14, 16, 18, 20), new_maps=(3, 3, 3, 3),
          pooling_width=(2, 2, 2, 2), dnn_hidden_units=(256, 128, 64),
          l2_reg_linear=1e-5, l2_reg_embedding=1e-5, l2_reg_dnn=0, dnn_dropout=0,
          seed=1024, task="binary"):
    """Instantiates FGCNN (same signature as reference fgcnn.py:30)."""
    if not (len(conv_kernel_width) == len(conv_filters) == len(new_maps)
            == len(pooling_width)):
        raise ValueError(
            "conv_kernel_width,conv_filters,new_maps  and pooling_width must have same length"
        )
    module = FGCNNModule(
        tuple(linear_feature_columns), tuple(dnn_feature_columns),
        tuple(conv_kernel_width), tuple(conv_filters), tuple(new_maps),
        tuple(pooling_width), tuple(dnn_hidden_units), l2_reg_linear,
        l2_reg_embedding, l2_reg_dnn, dnn_dropout, seed, task,
    )
    fcs = unified_feature_columns(linear_feature_columns, dnn_feature_columns)
    return CTRModel(module, fcs, task=task, seed=seed)
