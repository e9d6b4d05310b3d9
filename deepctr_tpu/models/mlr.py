"""MLR / piece-wise linear model (reference deepctr/models/mlr.py:17-74).

final = sum_r softmax(region_logit)_r * sigmoid(learner_logit)_r, optionally
multiplied by a bias piece score. The model output IS the final score (the
reference applies no extra PredictionLayer on top).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..inputs import LinearLogit
from ._common import register, unified_feature_columns
from ..training.model import CTRModel


class MLRModule(nn.Module):
    region_feature_columns: Tuple
    base_feature_columns: Tuple
    region_num: int = 4
    l2_reg_linear: float = 1e-5
    seed: int = 1024
    task: str = "binary"
    bias_feature_columns: Tuple = ()

    @nn.compact
    def __call__(self, features, training: bool = False):
        region_logit = LinearLogit(
            self.region_feature_columns, units=self.region_num,
            l2_reg=self.l2_reg_linear, prefix="region", name="region",
        )(features)  # (B, region_num)
        region_score = jax.nn.softmax(region_logit, axis=-1)

        learner_logit = LinearLogit(
            self.base_feature_columns, units=self.region_num,
            l2_reg=self.l2_reg_linear, prefix="learner", name="learner",
        )(features)
        learner_score = (
            jax.nn.sigmoid(learner_logit) if self.task == "binary" else learner_logit
        )

        final = jnp.sum(region_score * learner_score, axis=-1, keepdims=True)

        if len(self.bias_feature_columns) > 0:
            bias_logit = LinearLogit(
                self.bias_feature_columns, units=1, l2_reg=self.l2_reg_linear,
                prefix="bias", name="bias_piece",
            )(features)
            bias_score = jax.nn.sigmoid(bias_logit)
            final = final * bias_score
        return final.reshape(-1, 1)


@register
def MLR(region_feature_columns, base_feature_columns=None, region_num=4,
        l2_reg_linear=1e-5, seed=1024, task="binary", bias_feature_columns=None):
    """Instantiates MLR (same signature as reference mlr.py:17)."""
    if region_num <= 1:
        raise ValueError("region_num must > 1")
    if base_feature_columns is None or len(base_feature_columns) == 0:
        base_feature_columns = region_feature_columns
    if bias_feature_columns is None:
        bias_feature_columns = []
    module = MLRModule(
        tuple(region_feature_columns), tuple(base_feature_columns), region_num,
        l2_reg_linear, seed, task, tuple(bias_feature_columns),
    )
    fcs = unified_feature_columns(
        region_feature_columns, base_feature_columns, bias_feature_columns
    )
    return CTRModel(module, fcs, task=task, seed=seed)
