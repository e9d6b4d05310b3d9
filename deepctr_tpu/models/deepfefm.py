"""DeepFEFM (reference deepctr/models/deepfefm.py:26-103)."""
from __future__ import annotations

from itertools import chain
from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..features import DEFAULT_GROUP_NAME
from ..inputs import EmbeddingTables, LinearLogit, fold_linear_split
from ..layers.core import DNN, PredictionLayer
from ..layers.interaction import FEFMLayer
from ..layers.utils import add_func, combined_dnn_input, concat_func
from ._common import DenseLogit, register, unified_feature_columns
from ..training.model import CTRModel


class DeepFEFMModule(nn.Module):
    linear_feature_columns: Tuple
    dnn_feature_columns: Tuple
    use_fefm: bool = True
    dnn_hidden_units: Tuple[int, ...] = (256, 128, 64)
    l2_reg_linear: float = 1e-5
    l2_reg_embedding_feat: float = 1e-5
    l2_reg_embedding_field: float = 1e-5
    l2_reg_dnn: float = 0.0
    seed: int = 1024
    dnn_dropout: float = 0.0
    exclude_feature_embed_in_dnn: bool = False
    use_linear: bool = True
    use_fefm_embed_in_dnn: bool = True
    dnn_activation: Any = "relu"
    dnn_use_bn: bool = False
    task: str = "binary"

    @nn.compact
    def __call__(self, features, training: bool = False):
        folded, lin_rest = fold_linear_split(
            self.linear_feature_columns, self.dnn_feature_columns)
        tables = EmbeddingTables(
            self.dnn_feature_columns, self.l2_reg_embedding_feat,
            linear_columns=folded, linear_l2=self.l2_reg_linear,
            name="embeddings",
        )
        group_embedding_dict, dense_list, lin_vals = tables(features, support_group=True, return_linear=True)
        linear_logit = LinearLogit(
            lin_rest, l2_reg=self.l2_reg_linear, name="linear"
        )(features, extra_sparse=lin_vals)

        fefm_interaction_embedding = concat_func([
            FEFMLayer(self.l2_reg_embedding_field, name="fefm_" + k)(
                concat_func(v, axis=1)
            )
            for k, v in group_embedding_dict.items()
            if k in (DEFAULT_GROUP_NAME,) and len(v) > 1
        ], axis=1)

        dnn_input = combined_dnn_input(
            list(chain.from_iterable(group_embedding_dict.values())), dense_list
        )
        if self.use_fefm_embed_in_dnn:
            if self.exclude_feature_embed_in_dnn:
                dnn_input = fefm_interaction_embedding
            else:
                dnn_input = concat_func([dnn_input, fefm_interaction_embedding], axis=1)

        units = len(self.dnn_hidden_units)
        dnn_logit = None
        if units > 0:
            dnn_out = DNN(
                tuple(self.dnn_hidden_units), self.dnn_activation, self.l2_reg_dnn,
                self.dnn_dropout, self.dnn_use_bn, seed=self.seed, name="dnn",
            )(dnn_input, training=training)
            dnn_logit = DenseLogit(name="dnn_logit")(dnn_out)
        fefm_logit = jnp.sum(fefm_interaction_embedding, axis=1, keepdims=True)

        parts = []
        if self.use_linear:
            parts.append(linear_logit)
        if self.use_fefm:
            parts.append(fefm_logit)
        if units > 0:
            parts.append(dnn_logit)
        if not parts:
            raise NotImplementedError
        return PredictionLayer(self.task)(add_func(parts))


@register
def DeepFEFM(linear_feature_columns, dnn_feature_columns, use_fefm=True,
             dnn_hidden_units=(256, 128, 64), l2_reg_linear=1e-5,
             l2_reg_embedding_feat=1e-5, l2_reg_embedding_field=1e-5,
             l2_reg_dnn=0, seed=1024, dnn_dropout=0.0,
             exclude_feature_embed_in_dnn=False, use_linear=True,
             use_fefm_embed_in_dnn=True, dnn_activation="relu", dnn_use_bn=False,
             task="binary"):
    """Instantiates DeepFEFM (same signature as reference deepfefm.py:26)."""
    module = DeepFEFMModule(
        tuple(linear_feature_columns), tuple(dnn_feature_columns), use_fefm,
        tuple(dnn_hidden_units), l2_reg_linear, l2_reg_embedding_feat,
        l2_reg_embedding_field, l2_reg_dnn, seed, dnn_dropout,
        exclude_feature_embed_in_dnn, use_linear, use_fefm_embed_in_dnn,
        dnn_activation, dnn_use_bn, task,
    )
    fcs = unified_feature_columns(linear_feature_columns, dnn_feature_columns)
    return CTRModel(module, fcs, task=task, seed=seed)
