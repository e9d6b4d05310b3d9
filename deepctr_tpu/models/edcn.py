"""EDCN (reference deepctr/models/edcn.py:22-94)."""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn

from ..inputs import EmbeddingTables, LinearLogit, fold_linear_split
from ..layers.core import DNN, PredictionLayer, RegulationModule
from ..layers.interaction import BridgeModule, CrossNet
from ..layers.utils import add_func, concat_func
from ._common import DenseLogit, register, unified_feature_columns
from ..training.model import CTRModel


class EDCNModule(nn.Module):
    linear_feature_columns: Tuple
    dnn_feature_columns: Tuple
    cross_num: int = 2
    cross_parameterization: str = "vector"
    bridge_type: str = "concatenation"
    tau: float = 1.0
    l2_reg_linear: float = 1e-5
    l2_reg_embedding: float = 1e-5
    l2_reg_cross: float = 1e-5
    l2_reg_dnn: float = 0.0
    seed: int = 1024
    dnn_dropout: float = 0.0
    dnn_use_bn: bool = False
    dnn_activation: Any = "relu"
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
        emb_input = concat_func(sparse_list, axis=1)  # (B, F, E)
        field_size, embedding_size = emb_input.shape[1], emb_input.shape[2]
        cross_dim = field_size * embedding_size

        deep_in = RegulationModule(self.tau, name="reg_deep_0")(emb_input)
        cross_in = RegulationModule(self.tau, name="reg_cross_0")(emb_input)
        cross_out = deep_out = bridge_out = None
        for i in range(self.cross_num):
            cross_out = CrossNet(
                1, self.cross_parameterization, self.l2_reg_cross,
                name="cross_%d" % i,
            )(cross_in)
            deep_out = DNN(
                (cross_dim,), self.dnn_activation, self.l2_reg_dnn,
                self.dnn_dropout, self.dnn_use_bn, seed=self.seed,
                name="dnn_%d" % i,
            )(deep_in, training=training)
            bridge_out = BridgeModule(self.bridge_type, name="bridge_%d" % i)(
                [cross_out, deep_out], training=training
            )
            if i + 1 < self.cross_num:
                bridge_3d = bridge_out.reshape(-1, field_size, embedding_size)
                deep_in = RegulationModule(self.tau, name="reg_deep_%d" % (i + 1))(bridge_3d)
                cross_in = RegulationModule(self.tau, name="reg_cross_%d" % (i + 1))(bridge_3d)

        stack_out = concat_func([cross_out, deep_out, bridge_out])
        final_logit = DenseLogit(name="stack_logit")(stack_out)
        final_logit = add_func([final_logit, linear_logit])
        return PredictionLayer(self.task)(final_logit)


@register
def EDCN(linear_feature_columns, dnn_feature_columns, cross_num=2,
         cross_parameterization="vector", bridge_type="concatenation", tau=1.0,
         l2_reg_linear=1e-5, l2_reg_embedding=1e-5, l2_reg_cross=1e-5,
         l2_reg_dnn=0, seed=1024, dnn_dropout=0, dnn_use_bn=False,
         dnn_activation="relu", task="binary"):
    """Instantiates EDCN (same signature as reference edcn.py:22)."""
    if cross_num == 0:
        raise ValueError("Cross layer num must > 0")
    module = EDCNModule(
        tuple(linear_feature_columns), tuple(dnn_feature_columns), cross_num,
        cross_parameterization, bridge_type, tau, l2_reg_linear, l2_reg_embedding,
        l2_reg_cross, l2_reg_dnn, seed, dnn_dropout, dnn_use_bn, dnn_activation,
        task,
    )
    fcs = unified_feature_columns(linear_feature_columns, dnn_feature_columns)
    return CTRModel(module, fcs, task=task, seed=seed)
