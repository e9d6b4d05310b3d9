"""ESMM (reference deepctr/models/multitask/esmm.py:20-66).

Outputs [CTR, CTCVR] with CTCVR = CTR * CVR; exactly two binary tasks.
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...inputs import EmbeddingTables
from ...layers.core import DNN, PredictionLayer
from ...layers.utils import combined_dnn_input
from .._common import DenseLogit, register, unified_feature_columns
from ...training.model import CTRModel


class ESMMModule(nn.Module):
    dnn_feature_columns: Tuple
    tower_dnn_hidden_units: Tuple[int, ...] = (256, 128, 64)
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
        ctr_out = DNN(
            tuple(self.tower_dnn_hidden_units), self.dnn_activation,
            self.l2_reg_dnn, self.dnn_dropout, self.dnn_use_bn, seed=self.seed,
            name="ctr_tower",
        )(dnn_input, training=training)
        cvr_out = DNN(
            tuple(self.tower_dnn_hidden_units), self.dnn_activation,
            self.l2_reg_dnn, self.dnn_dropout, self.dnn_use_bn, seed=self.seed,
            name="cvr_tower",
        )(dnn_input, training=training)
        ctr_pred = PredictionLayer("binary", name="ctr_pred")(
            DenseLogit(name="ctr_logit")(ctr_out)
        )
        cvr_pred = PredictionLayer("binary", name="cvr_pred")(
            DenseLogit(name="cvr_logit")(cvr_out)
        )
        ctcvr_pred = ctr_pred * cvr_pred
        return jnp.concatenate([ctr_pred, ctcvr_pred], axis=-1)


@register
def ESMM(dnn_feature_columns, tower_dnn_hidden_units=(256, 128, 64),
         l2_reg_embedding=1e-5, l2_reg_dnn=0, seed=1024, dnn_dropout=0,
         dnn_activation="relu", dnn_use_bn=False,
         task_types=("binary", "binary"), task_names=("ctr", "ctcvr")):
    """Instantiates ESMM (same signature as reference esmm.py:20)."""
    if len(task_names) != 2:
        raise ValueError("the length of task_names must be equal to 2")
    for task_type in task_types:
        if task_type != "binary":
            raise ValueError("task must be binary in ESMM, {} is illegal".format(task_type))
    module = ESMMModule(
        tuple(dnn_feature_columns), tuple(tower_dnn_hidden_units),
        l2_reg_embedding, l2_reg_dnn, seed, dnn_dropout, dnn_activation,
        dnn_use_bn, tuple(task_types), tuple(task_names),
    )
    fcs = unified_feature_columns(dnn_feature_columns)
    return CTRModel(module, fcs, task=list(task_types), num_outputs=2,
                    output_names=list(task_names), seed=seed)
