"""ONN / NFFM (reference deepctr/models/onn.py:33-116).

The reference creates one Keras Embedding PER (feature, partner) pair —
O(n^2) tables and O(n^2) gathers. TPU-first redesign: each feature's
per-partner tables are fused into ONE (vocab, (n-1)*dim) table, so each
feature costs exactly one gather; pairs then read static slices of the
gathered block (the "pair-indexed offsets" plan from SURVEY §7).
"""
from __future__ import annotations

import itertools
from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..features import SparseFeat, VarLenSparseFeat, split_columns
from ..inputs import LinearLogit, get_dense_input, resolve_initializer
from ..layers.base import l2_reg as _l2_reg
from ..layers.core import DNN, PredictionLayer
from ..layers.sequence import sequence_pooling
from ..layers.utils import add_func, combined_dnn_input, concat_func, flatten
from ._common import DenseLogit, register, unified_feature_columns
from ..training.model import CTRModel


class ONNModule(nn.Module):
    linear_feature_columns: Tuple
    dnn_feature_columns: Tuple
    dnn_hidden_units: Tuple[int, ...] = (256, 128, 64)
    l2_reg_embedding: float = 1e-5
    l2_reg_linear: float = 1e-5
    l2_reg_dnn: float = 0.0
    dnn_dropout: float = 0.0
    seed: int = 1024
    use_bn: bool = True
    reduce_sum: bool = False
    task: str = "binary"

    @nn.compact
    def __call__(self, features, training: bool = False):
        linear_logit = LinearLogit(
            self.linear_feature_columns, l2_reg=self.l2_reg_linear, name="linear"
        )(features)
        sparse_cols, varlen_cols, _ = split_columns(self.dnn_feature_columns)
        ops_cols = sparse_cols + varlen_cols
        n = len(ops_cols)
        if n < 2:
            raise ValueError("ONN requires at least 2 sparse features")

        # fused per-feature operation tables: (vocab, (n-1) * dim)
        per_feat = []  # (B, n-1, D) pooled per-partner embeddings
        for fc in ops_cols:
            table = self.param(
                "op_emb_" + fc.name,
                resolve_initializer(fc.embeddings_initializer),
                (fc.vocabulary_size, (n - 1) * fc.embedding_dim),
            )
            _l2_reg(self, self.l2_reg_embedding, table)
            ids = features[fc.name].astype(jnp.int32)
            if isinstance(fc, VarLenSparseFeat):
                seq = jnp.take(table, ids, axis=0, mode="clip")  # (B,T,(n-1)*D)
                mask = ids != 0
                pooled = sequence_pooling(seq, fc.combiner, mask=mask)  # (B,1,(n-1)*D)
                emb = pooled[:, 0, :].reshape(ids.shape[0], n - 1, fc.embedding_dim)
            else:
                flat = ids.reshape(-1)
                emb = jnp.take(table, flat, axis=0, mode="clip").reshape(
                    flat.shape[0], n - 1, fc.embedding_dim
                )
            per_feat.append(emb)

        def partner_idx(a, b):
            # index of feature b inside feature a's partner axis
            return b if b < a else b - 1

        embed_list = []
        for i, j in itertools.combinations(range(n), 2):
            prod = per_feat[i][:, partner_idx(i, j), :] * per_feat[j][:, partner_idx(j, i), :]
            if self.reduce_sum:
                prod = jnp.sum(prod, axis=-1, keepdims=True)
            embed_list.append(prod[:, None, :])

        ffm_out = flatten(concat_func(embed_list, axis=1))
        if self.use_bn:
            ffm_out = nn.BatchNorm(
                use_running_average=not training, momentum=0.99, name="ffm_bn"
            )(ffm_out)
        dense_list = get_dense_input(features, self.dnn_feature_columns)
        dnn_input = combined_dnn_input([ffm_out], dense_list)
        dnn_out = DNN(
            tuple(self.dnn_hidden_units), "relu", self.l2_reg_dnn,
            self.dnn_dropout, False, seed=self.seed, name="dnn",
        )(dnn_input, training=training)
        dnn_logit = DenseLogit(name="dnn_logit")(dnn_out)
        return PredictionLayer(self.task)(add_func([dnn_logit, linear_logit]))


@register
def ONN(linear_feature_columns, dnn_feature_columns, dnn_hidden_units=(256, 128, 64),
        l2_reg_embedding=1e-5, l2_reg_linear=1e-5, l2_reg_dnn=0, dnn_dropout=0,
        seed=1024, use_bn=True, reduce_sum=False, task="binary"):
    """Instantiates ONN (same signature as reference onn.py:33)."""
    module = ONNModule(
        tuple(linear_feature_columns), tuple(dnn_feature_columns),
        tuple(dnn_hidden_units), l2_reg_embedding, l2_reg_linear, l2_reg_dnn,
        dnn_dropout, seed, use_bn, reduce_sum, task,
    )
    fcs = unified_feature_columns(linear_feature_columns, dnn_feature_columns)
    return CTRModel(module, fcs, task=task, seed=seed)
