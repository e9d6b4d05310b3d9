"""DIN (reference deepctr/models/sequence/din.py:21-96).

History behavior sequence features are named ``hist_<feat>`` (same convention
as the reference, din.py:54); masks are explicit length/nonzero-id arrays
instead of Keras mask propagation.
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn

from ...features import DenseFeat, SparseFeat, VarLenSparseFeat
from ...inputs import EmbeddingTables
from ...layers.core import DNN, PredictionLayer
from ...layers.sequence import AttentionSequencePoolingLayer
from ...layers.utils import combined_dnn_input, concat_func, flatten
from .._common import DenseLogit, register, unified_feature_columns
from ...training.model import CTRModel


def split_history_columns(dnn_feature_columns, history_feature_list, prefix="hist_"):
    """Partition (sparse, dense, history-varlen, other-varlen) columns."""
    sparse_cols = [fc for fc in dnn_feature_columns if isinstance(fc, SparseFeat)]
    dense_cols = [fc for fc in dnn_feature_columns if isinstance(fc, DenseFeat)]
    varlen_cols = [fc for fc in dnn_feature_columns if isinstance(fc, VarLenSparseFeat)]
    history_fc_names = [prefix + x for x in history_feature_list]
    history_cols = [fc for fc in varlen_cols if fc.name in history_fc_names]
    other_varlen = [fc for fc in varlen_cols if fc.name not in history_fc_names]
    return sparse_cols, dense_cols, history_cols, other_varlen, history_fc_names


class DINModule(nn.Module):
    dnn_feature_columns: Tuple
    history_feature_list: Tuple[str, ...]
    dnn_use_bn: bool = False
    dnn_hidden_units: Tuple[int, ...] = (256, 128, 64)
    dnn_activation: Any = "relu"
    att_hidden_size: Tuple[int, ...] = (80, 40)
    att_activation: Any = "dice"
    att_weight_normalization: bool = False
    l2_reg_dnn: float = 0.0
    l2_reg_embedding: float = 1e-6
    dnn_dropout: float = 0.0
    seed: int = 1024
    task: str = "binary"

    @nn.compact
    def __call__(self, features, training: bool = False):
        sparse_cols, dense_cols, history_cols, other_varlen, history_fc_names = (
            split_history_columns(self.dnn_feature_columns, self.history_feature_list)
        )
        tables = EmbeddingTables(
            self.dnn_feature_columns, self.l2_reg_embedding, name="embeddings"
        )
        tables._reg_all()
        query_emb = concat_func(
            tables.lookup(features, sparse_cols,
                          return_feat_list=self.history_feature_list, to_list=True)
        )  # (B, 1, E)
        keys_emb = concat_func(
            tables.varlen_lookup(features, history_cols,
                                 return_feat_list=history_fc_names, to_list=True),
            axis=-1,
        )  # (B, T, E)
        key_mask = tables.varlen_mask(features, history_cols[0])  # (B, T)

        dnn_emb_list = tables.lookup(features, sparse_cols, to_list=True)
        dnn_emb_list += tables.pool_varlen(features, other_varlen, to_list=True)
        dense_list = [
            features[fc.name] if fc.transform_fn is None else fc.transform_fn(features[fc.name])
            for fc in dense_cols
        ]

        hist = AttentionSequencePoolingLayer(
            tuple(self.att_hidden_size), self.att_activation,
            self.att_weight_normalization, name="attention",
        )(query_emb, keys_emb, mask=key_mask, training=training)

        deep_input_emb = flatten(concat_func([concat_func(dnn_emb_list), hist]))
        dnn_input = combined_dnn_input([deep_input_emb], dense_list)
        output = DNN(
            tuple(self.dnn_hidden_units), self.dnn_activation, self.l2_reg_dnn,
            self.dnn_dropout, self.dnn_use_bn, seed=self.seed, name="dnn",
        )(dnn_input, training=training)
        final_logit = DenseLogit(name="dnn_logit")(output)
        return PredictionLayer(self.task)(final_logit)


@register
def DIN(dnn_feature_columns, history_feature_list, dnn_use_bn=False,
        dnn_hidden_units=(256, 128, 64), dnn_activation="relu",
        att_hidden_size=(80, 40), att_activation="dice",
        att_weight_normalization=False, l2_reg_dnn=0, l2_reg_embedding=1e-6,
        dnn_dropout=0, seed=1024, task="binary"):
    """Instantiates DIN (same signature as reference din.py:21)."""
    module = DINModule(
        tuple(dnn_feature_columns), tuple(history_feature_list), dnn_use_bn,
        tuple(dnn_hidden_units), dnn_activation, tuple(att_hidden_size),
        att_activation, att_weight_normalization, l2_reg_dnn, l2_reg_embedding,
        dnn_dropout, seed, task,
    )
    fcs = unified_feature_columns(dnn_feature_columns)
    return CTRModel(module, fcs, task=task, seed=seed)
