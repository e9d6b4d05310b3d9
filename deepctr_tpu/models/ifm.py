"""IFM (reference deepctr/models/ifm.py:22-74)."""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..features import SparseFeat, VarLenSparseFeat
from ..inputs import EmbeddingTables, LinearLogit, fold_linear_split
from ..layers.core import DNN, PredictionLayer
from ..layers.utils import add_func, combined_dnn_input, concat_func
from ..layers.interaction import FM
from ._common import register, unified_feature_columns
from ..training.model import CTRModel


class IFMModule(nn.Module):
    linear_feature_columns: Tuple
    dnn_feature_columns: Tuple
    dnn_hidden_units: Tuple[int, ...] = (256, 128, 64)
    l2_reg_linear: float = 1e-5
    l2_reg_embedding: float = 1e-5
    l2_reg_dnn: float = 0.0
    seed: int = 1024
    dnn_dropout: float = 0.0
    dnn_activation: Any = "relu"
    dnn_use_bn: bool = False
    task: str = "binary"

    @nn.compact
    def __call__(self, features, training: bool = False):
        sparse_feat_num = len([
            fc for fc in self.dnn_feature_columns
            if isinstance(fc, (SparseFeat, VarLenSparseFeat))
        ])
        folded, lin_rest = fold_linear_split(
            self.linear_feature_columns, self.dnn_feature_columns)
        tables = EmbeddingTables(
            self.dnn_feature_columns, self.l2_reg_embedding,
            linear_columns=folded, linear_l2=self.l2_reg_linear,
            name="embeddings",
        )
        sparse_list, _, lin_vals = tables(features, return_linear=True)
        if not len(sparse_list) > 0:
            raise ValueError("there are no sparse features")
        dnn_input = combined_dnn_input(sparse_list, [])
        dnn_output = DNN(
            tuple(self.dnn_hidden_units), self.dnn_activation, self.l2_reg_dnn,
            self.dnn_dropout, self.dnn_use_bn, seed=self.seed, name="dnn",
        )(dnn_input, training=training)
        m_prime = nn.Dense(
            sparse_feat_num, use_bias=False,
            kernel_init=nn.initializers.glorot_uniform(), name="factor_estimate",
        )(dnn_output)
        # m_{x,i} = n * softmax(m'_x) (reference ifm.py:63)
        input_aware_factor = sparse_feat_num * jax.nn.softmax(m_prime, axis=1)

        linear_logit = LinearLogit(
            lin_rest, l2_reg=self.l2_reg_linear, name="linear"
        )(features, sparse_feat_refine_weight=input_aware_factor, extra_sparse=lin_vals)

        fm_input = concat_func(sparse_list, axis=1)
        refined_fm_input = fm_input * input_aware_factor[:, :, None]
        fm_logit = FM()(refined_fm_input)
        return PredictionLayer(self.task)(add_func([linear_logit, fm_logit]))


@register
def IFM(linear_feature_columns, dnn_feature_columns, dnn_hidden_units=(256, 128, 64),
        l2_reg_linear=1e-5, l2_reg_embedding=1e-5, l2_reg_dnn=0, seed=1024,
        dnn_dropout=0, dnn_activation="relu", dnn_use_bn=False, task="binary"):
    """Instantiates IFM (same signature as reference ifm.py:22)."""
    if not len(dnn_hidden_units) > 0:
        raise ValueError("dnn_hidden_units is null!")
    module = IFMModule(
        tuple(linear_feature_columns), tuple(dnn_feature_columns),
        tuple(dnn_hidden_units), l2_reg_linear, l2_reg_embedding, l2_reg_dnn,
        seed, dnn_dropout, dnn_activation, dnn_use_bn, task,
    )
    fcs = unified_feature_columns(linear_feature_columns, dnn_feature_columns)
    return CTRModel(module, fcs, task=task, seed=seed)
