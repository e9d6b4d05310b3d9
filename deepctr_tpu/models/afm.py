"""AFM (reference deepctr/models/afm.py:20-61)."""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn

from ..features import DEFAULT_GROUP_NAME
from ..inputs import EmbeddingTables, LinearLogit, fold_linear_split
from ..layers.core import PredictionLayer
from ..layers.interaction import AFMLayer, FM
from ..layers.utils import add_func, concat_func
from ._common import register, unified_feature_columns
from ..training.model import CTRModel


class AFMModule(nn.Module):
    linear_feature_columns: Tuple
    dnn_feature_columns: Tuple
    fm_group: Tuple[str, ...] = (DEFAULT_GROUP_NAME,)
    use_attention: bool = True
    attention_factor: int = 8
    l2_reg_linear: float = 1e-5
    l2_reg_embedding: float = 1e-5
    l2_reg_att: float = 1e-5
    afm_dropout: float = 0.0
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
        group_embedding_dict, _, lin_vals = tables(features, support_dense=False, support_group=True, return_linear=True)
        linear_logit = LinearLogit(
            lin_rest, l2_reg=self.l2_reg_linear, name="linear"
        )(features, extra_sparse=lin_vals)
        if self.use_attention:
            fm_logit = add_func([
                AFMLayer(self.attention_factor, self.l2_reg_att, self.afm_dropout,
                         self.seed, name="afm_" + k)(list(v), training=training)
                for k, v in group_embedding_dict.items()
                if k in self.fm_group and len(v) > 1
            ])
        else:
            fm_logit = add_func([
                FM()(concat_func(v, axis=1))
                for k, v in group_embedding_dict.items()
                if k in self.fm_group and len(v) > 0
            ])
        final_logit = add_func([linear_logit, fm_logit])
        return PredictionLayer(self.task)(final_logit)


@register
def AFM(linear_feature_columns, dnn_feature_columns, fm_group=DEFAULT_GROUP_NAME,
        use_attention=True, attention_factor=8, l2_reg_linear=1e-5,
        l2_reg_embedding=1e-5, l2_reg_att=1e-5, afm_dropout=0, seed=1024,
        task="binary"):
    """Instantiates AFM (same signature as reference afm.py:20)."""
    if isinstance(fm_group, str):
        fm_group = (fm_group,)
    module = AFMModule(
        tuple(linear_feature_columns), tuple(dnn_feature_columns), tuple(fm_group),
        use_attention, attention_factor, l2_reg_linear, l2_reg_embedding,
        l2_reg_att, afm_dropout, seed, task,
    )
    fcs = unified_feature_columns(linear_feature_columns, dnn_feature_columns)
    return CTRModel(module, fcs, task=task, seed=seed)
