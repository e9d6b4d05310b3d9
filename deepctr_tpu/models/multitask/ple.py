"""PLE (reference deepctr/models/multitask/ple.py:22-155).

Multi-level Customized Gate Control: per-task specific experts + shared
experts, task gates every level, plus a shared gate on non-final levels.
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


class PLEModule(nn.Module):
    dnn_feature_columns: Tuple
    shared_expert_num: int = 1
    specific_expert_num: int = 1
    num_levels: int = 2
    expert_dnn_hidden_units: Tuple[int, ...] = (256,)
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

    def _dnn(self, units, name):
        return DNN(tuple(units), self.dnn_activation, self.l2_reg_dnn,
                   self.dnn_dropout, self.dnn_use_bn, seed=self.seed, name=name)

    def _gate(self, gate_input, cur_experts, num_experts, name, training):
        """softmax-gated mixture of the stacked (B, E, D) experts."""
        gate_hidden = self._dnn(self.gate_dnn_hidden_units, name + "_dnn")(
            gate_input, training=training
        )
        gate_out = jax.nn.softmax(
            nn.Dense(num_experts, use_bias=False,
                     kernel_init=nn.initializers.glorot_uniform(),
                     name=name + "_softmax")(gate_hidden),
            axis=-1,
        )
        return jnp.einsum("bed,be->bd", cur_experts, gate_out)

    def _cgc_net(self, inputs, level_name, is_last, training):
        num_tasks = len(self.task_names)
        specific_experts = []  # per task, list of expert outputs
        for i in range(num_tasks):
            for j in range(self.specific_expert_num):
                specific_experts.append(
                    self._dnn(
                        self.expert_dnn_hidden_units,
                        level_name + "task_%s_expert_specific_%d" % (self.task_names[i], j),
                    )(inputs[i], training=training)
                )
        shared_experts = [
            self._dnn(self.expert_dnn_hidden_units,
                      level_name + "expert_shared_%d" % k)(inputs[-1], training=training)
            for k in range(self.shared_expert_num)
        ]

        cgc_outs = []
        for i in range(num_tasks):
            cur = specific_experts[
                i * self.specific_expert_num:(i + 1) * self.specific_expert_num
            ] + shared_experts
            cur_experts = jnp.stack(cur, axis=1)
            cgc_outs.append(self._gate(
                inputs[i], cur_experts, len(cur),
                level_name + "gate_specific_" + self.task_names[i], training,
            ))
        if not is_last:
            cur = specific_experts + shared_experts
            cur_experts = jnp.stack(cur, axis=1)
            cgc_outs.append(self._gate(
                inputs[-1], cur_experts, len(cur),
                level_name + "gate_shared", training,
            ))
        return cgc_outs

    @nn.compact
    def __call__(self, features, training: bool = False):
        num_tasks = len(self.task_names)
        sparse_list, dense_list = EmbeddingTables(
            self.dnn_feature_columns, self.l2_reg_embedding, name="embeddings"
        )(features)
        dnn_input = combined_dnn_input(sparse_list, dense_list)

        ple_inputs = [dnn_input] * (num_tasks + 1)
        ple_outputs = []
        for i in range(self.num_levels):
            is_last = i == self.num_levels - 1
            ple_outputs = self._cgc_net(ple_inputs, "level_%d_" % i, is_last, training)
            if not is_last:
                ple_inputs = ple_outputs

        outs = []
        for task_type, task_name, ple_out in zip(self.task_types, self.task_names,
                                                 ple_outputs):
            tower = self._dnn(self.tower_dnn_hidden_units, "tower_" + task_name)(
                ple_out, training=training
            )
            logit = DenseLogit(name="logit_" + task_name)(tower)
            outs.append(PredictionLayer(task_type, name="pred_" + task_name)(logit))
        return jnp.concatenate(outs, axis=-1)


@register
def PLE(dnn_feature_columns, shared_expert_num=1, specific_expert_num=1,
        num_levels=2, expert_dnn_hidden_units=(256,), tower_dnn_hidden_units=(64,),
        gate_dnn_hidden_units=(), l2_reg_embedding=1e-5, l2_reg_dnn=0, seed=1024,
        dnn_dropout=0, dnn_activation="relu", dnn_use_bn=False,
        task_types=("binary", "binary"), task_names=("ctr", "ctcvr")):
    """Instantiates PLE (same signature as reference ple.py:22)."""
    num_tasks = validate_tasks(task_types, task_names)
    module = PLEModule(
        tuple(dnn_feature_columns), shared_expert_num, specific_expert_num,
        num_levels, tuple(expert_dnn_hidden_units), tuple(tower_dnn_hidden_units),
        tuple(gate_dnn_hidden_units), l2_reg_embedding, l2_reg_dnn, seed,
        dnn_dropout, dnn_activation, dnn_use_bn, tuple(task_types),
        tuple(task_names),
    )
    fcs = unified_feature_columns(dnn_feature_columns)
    return CTRModel(module, fcs, task=list(task_types), num_outputs=num_tasks,
                    output_names=list(task_names), seed=seed)
