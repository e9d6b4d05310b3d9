"""Estimator-style API (TPU-native replacement for deepctr/estimator).

The reference wraps ``tf.estimator.Estimator`` for "large scale data and
distributed training" (README.md:27). Here the same surface — 13 model
factories, ``train/evaluate/predict(input_fn)``, model_dir checkpointing,
FTRL-linear/Adagrad-deep dual optimizer — drives the jit/pjit CTRModel
engine instead of a TF session.
"""
from .core import Estimator, RunConfig
from .inputs import FixedLenFeature, input_fn_pandas, input_fn_tfrecord
from .models import (
    AFMEstimator,
    AutoIntEstimator,
    CCPMEstimator,
    DCNEstimator,
    DeepFEFMEstimator,
    DeepFMEstimator,
    FiBiNETEstimator,
    FNNEstimator,
    FwFMEstimator,
    NFMEstimator,
    PNNEstimator,
    WDLEstimator,
    xDeepFMEstimator,
)

__all__ = [
    "Estimator", "RunConfig", "FixedLenFeature", "input_fn_pandas", "input_fn_tfrecord",
    "AFMEstimator", "AutoIntEstimator", "CCPMEstimator", "DCNEstimator",
    "DeepFEFMEstimator", "DeepFMEstimator", "FiBiNETEstimator", "FNNEstimator",
    "FwFMEstimator", "NFMEstimator", "PNNEstimator", "WDLEstimator",
    "xDeepFMEstimator",
]
