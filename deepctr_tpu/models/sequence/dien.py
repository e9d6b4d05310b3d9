"""DIEN (reference deepctr/models/sequence/dien.py:112-219).

Interest extraction + evolution with GRU/AIGRU/AGRU/AUGRU via lax.scan
(layers/sequence.py `DynamicGRU`), optional negative-sampling auxiliary loss
recorded in the 'losses' collection (the trainer adds it to the total loss,
replacing the reference's model.add_loss, dien.py:212-213).
Name conventions: history ``hist_<feat>``, negatives ``neg_hist_<feat>``,
behavior length input ``seq_length`` (dien.py:141,153-154).
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...features import DenseFeat, SparseFeat, VarLenSparseFeat
from ...inputs import EmbeddingTables
from ...layers.base import add_aux_loss, sequence_mask
from ...layers.core import DNN, PredictionLayer
from ...layers.sequence import AttentionSequencePoolingLayer, DynamicGRU
from ...layers.utils import combined_dnn_input, concat_func, flatten
from .._common import DenseLogit, register, unified_feature_columns
from ...training.model import CTRModel

_EPS = 1e-8


class _AuxiliaryNet(nn.Module):
    """Shared per-step click/no-click classifier (reference dien.py:22-63)."""

    @nn.compact
    def __call__(self, h_states, click_seq, noclick_seq, lengths, training=False):
        T1 = click_seq.shape[1]
        mask = sequence_mask(lengths, T1)  # (B, T-1) float
        aux_nn = DNN((100, 50, 1), "sigmoid", name="auxiliary_nn")
        click_p = aux_nn(
            jnp.concatenate([h_states, click_seq], axis=-1), training=training
        )[:, :, 0]
        noclick_p = aux_nn(
            jnp.concatenate([h_states, noclick_seq], axis=-1), training=training
        )[:, :, 0]
        click_loss = -jnp.log(click_p + _EPS) * mask
        noclick_loss = -jnp.log(1.0 - noclick_p + _EPS) * mask
        return jnp.mean(click_loss + noclick_loss)


class DIENModule(nn.Module):
    dnn_feature_columns: Tuple
    history_feature_list: Tuple[str, ...]
    gru_type: str = "GRU"
    use_negsampling: bool = False
    alpha: float = 1.0
    use_bn: bool = False
    dnn_hidden_units: Tuple[int, ...] = (256, 128, 64)
    dnn_activation: Any = "relu"
    att_hidden_units: Tuple[int, ...] = (64, 16)
    att_activation: Any = "dice"
    att_weight_normalization: bool = True
    l2_reg_dnn: float = 0.0
    l2_reg_embedding: float = 1e-6
    dnn_dropout: float = 0.0
    seed: int = 1024
    task: str = "binary"

    @nn.compact
    def __call__(self, features, training: bool = False):
        if self.gru_type not in ("GRU", "AIGRU", "AGRU", "AUGRU"):
            raise ValueError("gru_type error ")
        sparse_cols = [fc for fc in self.dnn_feature_columns if isinstance(fc, SparseFeat)]
        dense_cols = [fc for fc in self.dnn_feature_columns if isinstance(fc, DenseFeat)]
        varlen_cols = [fc for fc in self.dnn_feature_columns if isinstance(fc, VarLenSparseFeat)]
        history_fc_names = ["hist_" + x for x in self.history_feature_list]
        neg_history_fc_names = ["neg_" + x for x in history_fc_names]
        history_cols = [fc for fc in varlen_cols if fc.name in history_fc_names]
        neg_history_cols = [fc for fc in varlen_cols if fc.name in neg_history_fc_names]
        other_varlen = [
            fc for fc in varlen_cols
            if fc.name not in history_fc_names and fc.name not in neg_history_fc_names
        ]
        user_behavior_length = features["seq_length"]

        # reference creates tables with seq_mask_zero=False (dien.py:166-167)
        tables = EmbeddingTables(
            self.dnn_feature_columns, self.l2_reg_embedding, seq_mask_zero=False,
            name="embeddings",
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
        dnn_emb_list = tables.lookup(features, sparse_cols, to_list=True)
        dnn_emb_list += tables.pool_varlen(features, other_varlen, to_list=True)
        dense_list = [
            features[fc.name] if fc.transform_fn is None else fc.transform_fn(features[fc.name])
            for fc in dense_cols
        ]

        # ---- interest extraction (gru1) -------------------------------
        rnn_outputs = DynamicGRU(return_sequence=True, name="gru1")(
            keys_emb, sequence_length=user_behavior_length
        )  # (B, T, E)

        if self.gru_type == "AUGRU" and self.use_negsampling:
            neg_concat_behavior = concat_func(
                tables.varlen_lookup(features, neg_history_cols,
                                     return_feat_list=neg_history_fc_names,
                                     to_list=True),
                axis=-1,
            )
            aux = _AuxiliaryNet(name="aux_net")(
                rnn_outputs[:, :-1, :], keys_emb[:, 1:, :],
                neg_concat_behavior[:, 1:, :],
                user_behavior_length.reshape(-1, 1) - 1, training=training,
            )
            add_aux_loss(self, self.alpha * aux)

        # ---- interest evolution (gru2) --------------------------------
        if self.gru_type == "GRU":
            rnn_outputs2 = DynamicGRU(return_sequence=True, name="gru2")(
                rnn_outputs, sequence_length=user_behavior_length
            )
            hist = AttentionSequencePoolingLayer(
                tuple(self.att_hidden_units), self.att_activation,
                self.att_weight_normalization, return_score=False, name="attention",
            )(query_emb, rnn_outputs2, keys_length=user_behavior_length,
              training=training)
        else:
            scores = AttentionSequencePoolingLayer(
                tuple(self.att_hidden_units), self.att_activation,
                self.att_weight_normalization, return_score=True, name="attention",
            )(query_emb, rnn_outputs, keys_length=user_behavior_length,
              training=training)  # (B, 1, T)
            if self.gru_type == "AIGRU":
                hist_seq = rnn_outputs * jnp.swapaxes(scores, 1, 2)  # (B,T,E)
                hist = DynamicGRU(gru_type="GRU", return_sequence=False, name="gru2")(
                    hist_seq, sequence_length=user_behavior_length
                )
            else:  # AGRU / AUGRU
                hist = DynamicGRU(gru_type=self.gru_type, return_sequence=False,
                                  name="gru2")(
                    rnn_outputs, sequence_length=user_behavior_length,
                    att_score=jnp.swapaxes(scores, 1, 2),
                )

        deep_input_emb = flatten(concat_func([concat_func(dnn_emb_list), hist]))
        dnn_input = combined_dnn_input([deep_input_emb], dense_list)
        output = DNN(
            tuple(self.dnn_hidden_units), self.dnn_activation, self.l2_reg_dnn,
            self.dnn_dropout, self.use_bn, seed=self.seed, name="dnn",
        )(dnn_input, training=training)
        final_logit = DenseLogit(name="dnn_logit")(output)
        return PredictionLayer(self.task)(final_logit)


@register
def DIEN(dnn_feature_columns, history_feature_list, gru_type="GRU",
         use_negsampling=False, alpha=1.0, use_bn=False,
         dnn_hidden_units=(256, 128, 64), dnn_activation="relu",
         att_hidden_units=(64, 16), att_activation="dice",
         att_weight_normalization=True, l2_reg_dnn=0, l2_reg_embedding=1e-6,
         dnn_dropout=0, seed=1024, task="binary"):
    """Instantiates DIEN (same signature as reference dien.py:112)."""
    module = DIENModule(
        tuple(dnn_feature_columns), tuple(history_feature_list), gru_type,
        use_negsampling, alpha, use_bn, tuple(dnn_hidden_units), dnn_activation,
        tuple(att_hidden_units), att_activation, att_weight_normalization,
        l2_reg_dnn, l2_reg_embedding, dnn_dropout, seed, task,
    )
    fcs = unified_feature_columns(dnn_feature_columns)
    return CTRModel(module, fcs, task=task, seed=seed)
