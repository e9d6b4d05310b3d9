"""DSIN (reference deepctr/models/sequence/dsin.py:26-167).

Per-session behavior inputs are named ``sess_<idx>_<feat>``; the session
count input is ``sess_length`` (dsin.py:80-87). One shared Transformer
extracts per-session interests; a BiLSTM models their evolution.
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...features import DenseFeat, SparseFeat, VarLenSparseFeat
from ...inputs import EmbeddingTables
from ...layers.core import DNN, PredictionLayer
from ...layers.sequence import (
    AttentionSequencePoolingLayer,
    BiasEncoding,
    BiLSTM,
    transformer_for_trace,
)
from ...layers.utils import combined_dnn_input, concat_func, flatten
from .._common import DenseLogit, register, unified_feature_columns
from ...training.model import CTRModel


class DSINModule(nn.Module):
    dnn_feature_columns: Tuple
    sess_feature_list: Tuple[str, ...]
    sess_max_count: int = 5
    bias_encoding: bool = False
    att_embedding_size: int = 1
    att_head_num: int = 8
    dnn_hidden_units: Tuple[int, ...] = (256, 128, 64)
    dnn_activation: Any = "relu"
    dnn_dropout: float = 0.0
    dnn_use_bn: bool = False
    l2_reg_dnn: float = 0.0
    l2_reg_embedding: float = 1e-6
    seed: int = 1024
    task: str = "binary"

    @nn.compact
    def __call__(self, features, training: bool = False):
        sparse_cols = [fc for fc in self.dnn_feature_columns if isinstance(fc, SparseFeat)]
        dense_cols = [fc for fc in self.dnn_feature_columns if isinstance(fc, DenseFeat)]
        user_sess_length = features["sess_length"]

        tables = EmbeddingTables(
            self.dnn_feature_columns, self.l2_reg_embedding, name="embeddings"
        )
        tables._reg_all()
        query_emb = concat_func(
            tables.lookup(features, sparse_cols,
                          return_feat_list=self.sess_feature_list, to_list=True)
        )  # (B, 1, E)
        dnn_emb_list = tables.lookup(features, sparse_cols, to_list=True)
        dense_list = [
            features[fc.name] if fc.transform_fn is None else fc.transform_fn(features[fc.name])
            for fc in dense_cols
        ]

        # ---- session interest division (dsin.py:145-158) ----------------
        feat_by_name = {fc.name: fc for fc in sparse_cols}
        tr_input, tr_masks = [], []
        for idx in range(self.sess_max_count):
            sess_embs = []
            sess_mask = None
            for feat in self.sess_feature_list:
                ids = features["sess_%d_%s" % (idx, feat)].astype(jnp.int32)
                table = tables._table(feat_by_name[feat])
                sess_embs.append(jnp.take(table, ids, axis=0, mode="clip"))
                if sess_mask is None:
                    sess_mask = ids != 0
            tr_input.append(concat_func(sess_embs, axis=-1))  # (B, T, E)
            tr_masks.append(sess_mask)
        if self.bias_encoding:
            tr_input = BiasEncoding(self.sess_max_count, self.seed, name="bias_enc")(
                tr_input if self.sess_max_count > 1 else tr_input[0]
            )
            if self.sess_max_count == 1:
                tr_input = [tr_input]

        # ---- shared-transformer interest extractor (dsin.py:161-167) ----
        # transformer_for_trace: rematerialized under the remat scope
        # (TPU default) — positional args, training static (argnum 7)
        self_attention = transformer_for_trace()(
            self.att_embedding_size, self.att_head_num, dropout_rate=0,
            use_layer_norm=False,
            use_positional_encoding=(not self.bias_encoding), seed=self.seed,
            blinding=True, output_type="mean", name="self_attention",
        )
        sess_fea = concat_func([
            self_attention(tr_input[i], tr_input[i],
                           tr_masks[i], tr_masks[i], None, None, training)
            for i in range(self.sess_max_count)
        ], axis=1)  # (B, sess_max_count, E)

        interest_attention = AttentionSequencePoolingLayer(
            att_hidden_units=(64, 16), weight_normalization=True,
            name="interest_attention",
        )(query_emb, sess_fea, keys_length=user_sess_length, training=training)

        hist_emb_size = sess_fea.shape[-1]
        lstm_outputs = BiLSTM(
            hist_emb_size, layers=2, res_layers=0, dropout_rate=0.2, name="bilstm"
        )(sess_fea, training=training)
        lstm_attention = AttentionSequencePoolingLayer(
            att_hidden_units=(64, 16), weight_normalization=True,
            name="lstm_attention",
        )(query_emb, lstm_outputs, keys_length=user_sess_length, training=training)

        dnn_input_emb = concat_func([
            flatten(concat_func(dnn_emb_list)),
            flatten(interest_attention),
            flatten(lstm_attention),
        ])
        dnn_input = combined_dnn_input([dnn_input_emb], dense_list)
        output = DNN(
            tuple(self.dnn_hidden_units), self.dnn_activation, self.l2_reg_dnn,
            self.dnn_dropout, self.dnn_use_bn, seed=self.seed, name="dnn",
        )(dnn_input, training=training)
        final_logit = DenseLogit(name="dnn_logit")(output)
        return PredictionLayer(self.task)(final_logit)


@register
def DSIN(dnn_feature_columns, sess_feature_list, sess_max_count=5,
         bias_encoding=False, att_embedding_size=1, att_head_num=8,
         dnn_hidden_units=(256, 128, 64), dnn_activation="relu", dnn_dropout=0,
         dnn_use_bn=False, l2_reg_dnn=0, l2_reg_embedding=1e-6, seed=1024,
         task="binary"):
    """Instantiates DSIN (same signature as reference dsin.py:26)."""
    hist_emb_size = sum(
        fc.embedding_dim for fc in dnn_feature_columns
        if isinstance(fc, SparseFeat) and fc.name in sess_feature_list
    )
    if att_embedding_size * att_head_num != hist_emb_size:
        raise ValueError(
            "hist_emb_size must equal to att_embedding_size * att_head_num ,got %d != %d *%d"
            % (hist_emb_size, att_embedding_size, att_head_num)
        )
    module = DSINModule(
        tuple(dnn_feature_columns), tuple(sess_feature_list), sess_max_count,
        bias_encoding, att_embedding_size, att_head_num, tuple(dnn_hidden_units),
        dnn_activation, dnn_dropout, dnn_use_bn, l2_reg_dnn, l2_reg_embedding,
        seed, task,
    )
    # extra host input: the session count (reference dsin.py:87 Input 'sess_length')
    fcs = unified_feature_columns(dnn_feature_columns) + [DenseFeat("sess_length", 1)]
    return CTRModel(module, fcs, task=task, seed=seed)
