"""CCPM (reference deepctr/models/ccpm.py:24-81)."""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..inputs import EmbeddingTables, LinearLogit, fold_linear_split
from ..layers.core import DNN, PredictionLayer
from ..layers.sequence import k_max_pooling
from ..layers.utils import add_func, concat_func, flatten
from ._common import DenseLogit, register, unified_feature_columns
from ..training.model import CTRModel


class CCPMModule(nn.Module):
    linear_feature_columns: Tuple
    dnn_feature_columns: Tuple
    conv_kernel_width: Tuple[int, ...] = (6, 5)
    conv_filters: Tuple[int, ...] = (4, 4)
    dnn_hidden_units: Tuple[int, ...] = (128, 64)
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
        sparse_list, _, lin_vals = tables(features, support_dense=False, return_linear=True)
        linear_logit = LinearLogit(
            lin_rest, l2_reg=self.l2_reg_linear, name="linear"
        )(features, extra_sparse=lin_vals)
        n = len(sparse_list)
        L = len(self.conv_filters)
        conv_input = concat_func(sparse_list, axis=1)  # (B, n, E)
        pooling_result = conv_input[:, :, :, None]  # NHWC
        for i in range(1, L + 1):
            filters = self.conv_filters[i - 1]
            width = self.conv_kernel_width[i - 1]
            # k-max schedule from the paper (reference ccpm.py:62)
            k = max(1, int((1 - pow(i / L, L - i)) * n)) if i < L else 3
            conv_result = nn.Conv(
                features=filters, kernel_size=(width, 1), strides=(1, 1),
                padding="SAME", use_bias=True, name="conv%d" % i,
            )(pooling_result)
            conv_result = jnp.tanh(conv_result)
            pooling_result = k_max_pooling(
                conv_result, k=min(k, conv_result.shape[1]), axis=1
            )
        flatten_result = flatten(pooling_result)
        dnn_out = DNN(
            tuple(self.dnn_hidden_units), "relu", self.l2_reg_dnn,
            self.dnn_dropout, False, seed=self.seed, name="dnn",
        )(flatten_result, training=training)
        dnn_logit = DenseLogit(name="dnn_logit")(dnn_out)
        return PredictionLayer(self.task)(add_func([dnn_logit, linear_logit]))


@register
def CCPM(linear_feature_columns, dnn_feature_columns, conv_kernel_width=(6, 5),
         conv_filters=(4, 4), dnn_hidden_units=(128, 64), l2_reg_linear=1e-5,
         l2_reg_embedding=1e-5, l2_reg_dnn=0, dnn_dropout=0, seed=1024,
         task="binary"):
    """Instantiates CCPM (same signature as reference ccpm.py:24)."""
    if len(conv_kernel_width) != len(conv_filters):
        raise ValueError("conv_kernel_width must have same element with conv_filters")
    module = CCPMModule(
        tuple(linear_feature_columns), tuple(dnn_feature_columns),
        tuple(conv_kernel_width), tuple(conv_filters), tuple(dnn_hidden_units),
        l2_reg_linear, l2_reg_embedding, l2_reg_dnn, dnn_dropout, seed, task,
    )
    fcs = unified_feature_columns(linear_feature_columns, dnn_feature_columns)
    return CTRModel(module, fcs, task=task, seed=seed)
