"""BST (reference deepctr/models/sequence/bst.py:23-107).

Behavior history named ``hist_<feat>``; the explicit behavior length input is
``seq_length`` (reference bst.py:46).
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn

from ...inputs import EmbeddingTables
from ...layers.core import DNN, PredictionLayer
from ...layers.sequence import (AttentionSequencePoolingLayer,
                                transformer_for_trace)
from ...layers.utils import combined_dnn_input, concat_func, flatten
from .._common import DenseLogit, register, unified_feature_columns
from ...training.model import CTRModel
from .din import split_history_columns


class BSTModule(nn.Module):
    dnn_feature_columns: Tuple
    history_feature_list: Tuple[str, ...]
    transformer_num: int = 1
    att_head_num: int = 8
    use_bn: bool = False
    dnn_hidden_units: Tuple[int, ...] = (256, 128, 64)
    dnn_activation: Any = "relu"
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
        user_behavior_length = features["seq_length"]
        tables = EmbeddingTables(
            self.dnn_feature_columns, self.l2_reg_embedding, name="embeddings"
        )
        tables._reg_all()
        query_emb = concat_func(
            tables.lookup(features, sparse_cols,
                          return_feat_list=self.history_feature_list, to_list=True)
        )
        hist_emb = concat_func(
            tables.varlen_lookup(features, history_cols,
                                 return_feat_list=history_fc_names, to_list=True),
            axis=-1,
        )  # (B, T, E)
        dnn_emb_list = tables.lookup(features, sparse_cols, to_list=True)
        dnn_emb_list += tables.pool_varlen(features, other_varlen, to_list=True)
        dense_list = [
            features[fc.name] if fc.transform_fn is None else fc.transform_fn(features[fc.name])
            for fc in dense_cols
        ]

        transformer_output = hist_emb
        for i in range(self.transformer_num):
            att_embedding_size = transformer_output.shape[-1] // self.att_head_num
            # transformer_for_trace: rematerialized under the remat scope
            # (TPU default) — positional args, training static (argnum 7)
            transformer_output = transformer_for_trace()(
                att_embedding_size=att_embedding_size, head_num=self.att_head_num,
                dropout_rate=self.dnn_dropout, use_positional_encoding=True,
                use_res=True, use_feed_forward=True, use_layer_norm=True,
                blinding=False, seed=self.seed, output_type=None,
                name="transformer_%d" % i,
            )(transformer_output, transformer_output, None, None,
              user_behavior_length, user_behavior_length, training)

        attn_output = AttentionSequencePoolingLayer(
            att_hidden_units=(64, 16), weight_normalization=True, name="attention",
        )(query_emb, transformer_output, keys_length=user_behavior_length,
          training=training)

        deep_input_emb = flatten(concat_func([concat_func(dnn_emb_list), attn_output]))
        dnn_input = combined_dnn_input([deep_input_emb], dense_list)
        output = DNN(
            tuple(self.dnn_hidden_units), self.dnn_activation, self.l2_reg_dnn,
            self.dnn_dropout, self.use_bn, seed=self.seed, name="dnn",
        )(dnn_input, training=training)
        final_logit = DenseLogit(name="dnn_logit")(output)
        return PredictionLayer(self.task)(final_logit)


@register
def BST(dnn_feature_columns, history_feature_list, transformer_num=1,
        att_head_num=8, use_bn=False, dnn_hidden_units=(256, 128, 64),
        dnn_activation="relu", l2_reg_dnn=0, l2_reg_embedding=1e-6,
        dnn_dropout=0.0, seed=1024, task="binary"):
    """Instantiates BST (same signature as reference bst.py:23)."""
    module = BSTModule(
        tuple(dnn_feature_columns), tuple(history_feature_list), transformer_num,
        att_head_num, use_bn, tuple(dnn_hidden_units), dnn_activation,
        l2_reg_dnn, l2_reg_embedding, dnn_dropout, seed, task,
    )
    fcs = unified_feature_columns(dnn_feature_columns)
    return CTRModel(module, fcs, task=task, seed=seed)
