"""MMOE (reference deepctr/models/multitask/mmoe.py:21-97).

Experts are computed as one batched tensor (B, num_experts, D) and gated per
task — the expert "MoE" is dense compute, not routed EP (SURVEY §2.6).
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...inputs import EmbeddingTables
from ...layers.core import DNN, PredictionLayer
from ...layers.utils import combined_dnn_input
from .._common import DenseLogit, register, unified_feature_columns
from ...training.model import CTRModel
from ._mtl_common import validate_tasks


class MMOEModule(nn.Module):
    dnn_feature_columns: Tuple
    num_experts: int = 3
    expert_dnn_hidden_units: Tuple[int, ...] = (256, 128)
    tower_dnn_hidden_units: Tuple[int, ...] = (64,)
    gate_dnn_hidden_units: Tuple[int, ...] = ()
    l2_reg_embedding: float = 1e-5
    l2_reg_dnn: float = 0.0
    seed: int = 1024
    dnn_dropout: float = 0.0
    dnn_activation: Any = "relu"
    dnn_use_bn: bool = False
    task_types: Tuple[str, ...] = ("binary", "binary")
    task_names: Tuple[str, ...] = ("ctr", "ctcvr")

    @nn.compact
    def __call__(self, features, training: bool = False):
        sparse_list, dense_list = EmbeddingTables(
            self.dnn_feature_columns, self.l2_reg_embedding, name="embeddings"
        )(features)
        dnn_input = combined_dnn_input(sparse_list, dense_list)

        expert_outs = jnp.stack([
            DNN(tuple(self.expert_dnn_hidden_units), self.dnn_activation,
                self.l2_reg_dnn, self.dnn_dropout, self.dnn_use_bn,
                seed=self.seed, name="expert_%d" % i)(dnn_input, training=training)
            for i in range(self.num_experts)
        ], axis=1)  # (B, num_experts, D)

        outs = []
        for task_type, task_name in zip(self.task_types, self.task_names):
            gate_input = DNN(
                tuple(self.gate_dnn_hidden_units), self.dnn_activation,
                self.l2_reg_dnn, self.dnn_dropout, self.dnn_use_bn,
                seed=self.seed, name="gate_" + task_name,
            )(dnn_input, training=training)
            gate_out = jax.nn.softmax(
                nn.Dense(self.num_experts, use_bias=False,
                         kernel_init=nn.initializers.glorot_uniform(),
                         name="gate_softmax_" + task_name)(gate_input),
                axis=-1,
            )  # (B, num_experts)
            mmoe_out = jnp.einsum("bed,be->bd", expert_outs, gate_out)
            tower = DNN(
                tuple(self.tower_dnn_hidden_units), self.dnn_activation,
                self.l2_reg_dnn, self.dnn_dropout, self.dnn_use_bn,
                seed=self.seed, name="tower_" + task_name,
            )(mmoe_out, training=training)
            logit = DenseLogit(name="logit_" + task_name)(tower)
            outs.append(PredictionLayer(task_type, name="pred_" + task_name)(logit))
        return jnp.concatenate(outs, axis=-1)


@register
def MMOE(dnn_feature_columns, num_experts=3, expert_dnn_hidden_units=(256, 128),
         tower_dnn_hidden_units=(64,), gate_dnn_hidden_units=(),
         l2_reg_embedding=1e-5, l2_reg_dnn=0, seed=1024, dnn_dropout=0,
         dnn_activation="relu", dnn_use_bn=False,
         task_types=("binary", "binary"), task_names=("ctr", "ctcvr")):
    """Instantiates MMOE (same signature as reference mmoe.py:21)."""
    num_tasks = validate_tasks(task_types, task_names)
    if num_experts <= 1:
        raise ValueError("num_experts must be greater than 1")
    module = MMOEModule(
        tuple(dnn_feature_columns), num_experts, tuple(expert_dnn_hidden_units),
        tuple(tower_dnn_hidden_units), tuple(gate_dnn_hidden_units),
        l2_reg_embedding, l2_reg_dnn, seed, dnn_dropout, dnn_activation,
        dnn_use_bn, tuple(task_types), tuple(task_names),
    )
    fcs = unified_feature_columns(dnn_feature_columns)
    return CTRModel(module, fcs, task=list(task_types), num_outputs=num_tasks,
                    output_names=list(task_names), seed=seed)
