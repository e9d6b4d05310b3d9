"""Estimator model factories (reference deepctr/estimator/models/, 13 models).

Each factory mirrors the reference signature — model_dir / config /
linear_optimizer / dnn_optimizer / training_chief_hooks — and returns an
``Estimator`` driving the corresponding TPU model with the reference's dual
FTRL-linear / Adagrad-deep optimizer split (estimator/utils.py:121-162).
Feature columns are the framework's SparseFeat/VarLenSparseFeat/DenseFeat
(the TPU-native replacement for native tf.feature_column inputs).
"""
from __future__ import annotations

from .. import models as _zoo
from .core import Estimator


def _make(model, task, model_dir, config, linear_optimizer, dnn_optimizer,
          training_chief_hooks):
    return Estimator(model, model_dir=model_dir, task=task,
                     linear_optimizer=linear_optimizer, dnn_optimizer=dnn_optimizer,
                     config=config, training_chief_hooks=training_chief_hooks)


def AFMEstimator(linear_feature_columns, dnn_feature_columns, use_attention=True,
                 attention_factor=8, l2_reg_linear=1e-5, l2_reg_embedding=1e-5,
                 l2_reg_att=1e-5, afm_dropout=0, seed=1024, task="binary",
                 model_dir=None, config=None, linear_optimizer="Ftrl",
                 dnn_optimizer="Adagrad", training_chief_hooks=None):
    """Reference: estimator/models/afm.py."""
    model = _zoo.AFM(linear_feature_columns, dnn_feature_columns,
                     use_attention=use_attention, attention_factor=attention_factor,
                     l2_reg_linear=l2_reg_linear, l2_reg_embedding=l2_reg_embedding,
                     l2_reg_att=l2_reg_att, afm_dropout=afm_dropout, seed=seed,
                     task=task)
    return _make(model, task, model_dir, config, linear_optimizer, dnn_optimizer,
                 training_chief_hooks)


def AutoIntEstimator(linear_feature_columns, dnn_feature_columns, att_layer_num=3,
                     att_embedding_size=8, att_head_num=2, att_res=True,
                     dnn_hidden_units=(256, 128, 64), dnn_activation="relu",
                     l2_reg_linear=1e-5, l2_reg_embedding=1e-5, l2_reg_dnn=0,
                     dnn_use_bn=False, dnn_dropout=0, seed=1024, task="binary",
                     model_dir=None, config=None, linear_optimizer="Ftrl",
                     dnn_optimizer="Adagrad", training_chief_hooks=None):
    """Reference: estimator/models/autoint.py."""
    model = _zoo.AutoInt(linear_feature_columns, dnn_feature_columns,
                         att_layer_num=att_layer_num,
                         att_embedding_size=att_embedding_size,
                         att_head_num=att_head_num, att_res=att_res,
                         dnn_hidden_units=dnn_hidden_units,
                         dnn_activation=dnn_activation, l2_reg_linear=l2_reg_linear,
                         l2_reg_embedding=l2_reg_embedding, l2_reg_dnn=l2_reg_dnn,
                         dnn_use_bn=dnn_use_bn, dnn_dropout=dnn_dropout, seed=seed,
                         task=task)
    return _make(model, task, model_dir, config, linear_optimizer, dnn_optimizer,
                 training_chief_hooks)


def CCPMEstimator(linear_feature_columns, dnn_feature_columns,
                  conv_kernel_width=(6, 5), conv_filters=(4, 4),
                  dnn_hidden_units=(128, 64), l2_reg_linear=1e-5,
                  l2_reg_embedding=1e-5, l2_reg_dnn=0, dnn_dropout=0, seed=1024,
                  task="binary", model_dir=None, config=None,
                  linear_optimizer="Ftrl", dnn_optimizer="Adagrad",
                  training_chief_hooks=None):
    """Reference: estimator/models/ccpm.py."""
    model = _zoo.CCPM(linear_feature_columns, dnn_feature_columns,
                      conv_kernel_width=conv_kernel_width, conv_filters=conv_filters,
                      dnn_hidden_units=dnn_hidden_units, l2_reg_linear=l2_reg_linear,
                      l2_reg_embedding=l2_reg_embedding, l2_reg_dnn=l2_reg_dnn,
                      dnn_dropout=dnn_dropout, seed=seed, task=task)
    return _make(model, task, model_dir, config, linear_optimizer, dnn_optimizer,
                 training_chief_hooks)


def DCNEstimator(linear_feature_columns, dnn_feature_columns, cross_num=2,
                 dnn_hidden_units=(256, 128, 64), l2_reg_linear=1e-5,
                 l2_reg_embedding=1e-5, l2_reg_cross=1e-5, l2_reg_dnn=0, seed=1024,
                 dnn_dropout=0, dnn_use_bn=False, dnn_activation="relu",
                 task="binary", model_dir=None, config=None,
                 linear_optimizer="Ftrl", dnn_optimizer="Adagrad",
                 training_chief_hooks=None):
    """Reference: estimator/models/dcn.py."""
    model = _zoo.DCN(linear_feature_columns, dnn_feature_columns,
                     cross_num=cross_num, dnn_hidden_units=dnn_hidden_units,
                     l2_reg_linear=l2_reg_linear, l2_reg_embedding=l2_reg_embedding,
                     l2_reg_cross=l2_reg_cross, l2_reg_dnn=l2_reg_dnn, seed=seed,
                     dnn_dropout=dnn_dropout, dnn_use_bn=dnn_use_bn,
                     dnn_activation=dnn_activation, task=task)
    return _make(model, task, model_dir, config, linear_optimizer, dnn_optimizer,
                 training_chief_hooks)


def DeepFEFMEstimator(linear_feature_columns, dnn_feature_columns,
                      dnn_hidden_units=(256, 128, 64), l2_reg_linear=1e-5,
                      l2_reg_embedding_feat=1e-5, l2_reg_embedding_field=1e-5,
                      l2_reg_dnn=0, seed=1024, dnn_dropout=0.0,
                      dnn_activation="relu", dnn_use_bn=False, task="binary",
                      model_dir=None, config=None, linear_optimizer="Ftrl",
                      dnn_optimizer="Adagrad", training_chief_hooks=None):
    """Reference: estimator/models/deepfefm.py."""
    model = _zoo.DeepFEFM(linear_feature_columns, dnn_feature_columns,
                          dnn_hidden_units=dnn_hidden_units,
                          l2_reg_linear=l2_reg_linear,
                          l2_reg_embedding_feat=l2_reg_embedding_feat,
                          l2_reg_embedding_field=l2_reg_embedding_field,
                          l2_reg_dnn=l2_reg_dnn, seed=seed, dnn_dropout=dnn_dropout,
                          dnn_activation=dnn_activation, dnn_use_bn=dnn_use_bn,
                          task=task)
    return _make(model, task, model_dir, config, linear_optimizer, dnn_optimizer,
                 training_chief_hooks)


def DeepFMEstimator(linear_feature_columns, dnn_feature_columns,
                    dnn_hidden_units=(256, 128, 64), l2_reg_linear=1e-5,
                    l2_reg_embedding=1e-5, l2_reg_dnn=0, seed=1024, dnn_dropout=0,
                    dnn_activation="relu", dnn_use_bn=False, task="binary",
                    model_dir=None, config=None, linear_optimizer="Ftrl",
                    dnn_optimizer="Adagrad", training_chief_hooks=None):
    """Reference: estimator/models/deepfm.py:20-76."""
    model = _zoo.DeepFM(linear_feature_columns, dnn_feature_columns,
                        dnn_hidden_units=dnn_hidden_units,
                        l2_reg_linear=l2_reg_linear,
                        l2_reg_embedding=l2_reg_embedding, l2_reg_dnn=l2_reg_dnn,
                        seed=seed, dnn_dropout=dnn_dropout,
                        dnn_activation=dnn_activation, dnn_use_bn=dnn_use_bn,
                        task=task)
    return _make(model, task, model_dir, config, linear_optimizer, dnn_optimizer,
                 training_chief_hooks)


def FiBiNETEstimator(linear_feature_columns, dnn_feature_columns,
                     bilinear_type="interaction", reduction_ratio=3,
                     dnn_hidden_units=(256, 128, 64), l2_reg_linear=1e-5,
                     l2_reg_embedding=1e-5, l2_reg_dnn=0, seed=1024, dnn_dropout=0,
                     dnn_activation="relu", task="binary", model_dir=None,
                     config=None, linear_optimizer="Ftrl", dnn_optimizer="Adagrad",
                     training_chief_hooks=None):
    """Reference: estimator/models/fibinet.py."""
    model = _zoo.FiBiNET(linear_feature_columns, dnn_feature_columns,
                         bilinear_type=bilinear_type, reduction_ratio=reduction_ratio,
                         dnn_hidden_units=dnn_hidden_units,
                         l2_reg_linear=l2_reg_linear,
                         l2_reg_embedding=l2_reg_embedding, l2_reg_dnn=l2_reg_dnn,
                         seed=seed, dnn_dropout=dnn_dropout,
                         dnn_activation=dnn_activation, task=task)
    return _make(model, task, model_dir, config, linear_optimizer, dnn_optimizer,
                 training_chief_hooks)


def FNNEstimator(linear_feature_columns, dnn_feature_columns,
                 dnn_hidden_units=(256, 128, 64), l2_reg_embedding=1e-5,
                 l2_reg_linear=1e-5, l2_reg_dnn=0, seed=1024, dnn_dropout=0,
                 dnn_activation="relu", task="binary", model_dir=None, config=None,
                 linear_optimizer="Ftrl", dnn_optimizer="Adagrad",
                 training_chief_hooks=None):
    """Reference: estimator/models/fnn.py."""
    model = _zoo.FNN(linear_feature_columns, dnn_feature_columns,
                     dnn_hidden_units=dnn_hidden_units,
                     l2_reg_embedding=l2_reg_embedding, l2_reg_linear=l2_reg_linear,
                     l2_reg_dnn=l2_reg_dnn, seed=seed, dnn_dropout=dnn_dropout,
                     dnn_activation=dnn_activation, task=task)
    return _make(model, task, model_dir, config, linear_optimizer, dnn_optimizer,
                 training_chief_hooks)


def FwFMEstimator(linear_feature_columns, dnn_feature_columns,
                  dnn_hidden_units=(256, 128, 64), l2_reg_linear=1e-5,
                  l2_reg_embedding=1e-5, l2_reg_field_strength=1e-5, l2_reg_dnn=0,
                  seed=1024, dnn_dropout=0, dnn_activation="relu",
                  dnn_use_bn=False, task="binary",
                  model_dir=None, config=None, linear_optimizer="Ftrl",
                  dnn_optimizer="Adagrad", training_chief_hooks=None):
    """Reference: estimator/models/fwfm.py."""
    model = _zoo.FwFM(linear_feature_columns, dnn_feature_columns,
                      dnn_hidden_units=dnn_hidden_units, l2_reg_linear=l2_reg_linear,
                      l2_reg_embedding=l2_reg_embedding,
                      l2_reg_field_strength=l2_reg_field_strength,
                      l2_reg_dnn=l2_reg_dnn, seed=seed, dnn_dropout=dnn_dropout,
                      dnn_activation=dnn_activation, dnn_use_bn=dnn_use_bn,
                      task=task)
    return _make(model, task, model_dir, config, linear_optimizer, dnn_optimizer,
                 training_chief_hooks)


def NFMEstimator(linear_feature_columns, dnn_feature_columns,
                 dnn_hidden_units=(256, 128, 64), l2_reg_embedding=1e-5,
                 l2_reg_linear=1e-5, l2_reg_dnn=0, seed=1024, bi_dropout=0,
                 dnn_dropout=0, dnn_activation="relu", task="binary",
                 model_dir=None, config=None, linear_optimizer="Ftrl",
                 dnn_optimizer="Adagrad", training_chief_hooks=None):
    """Reference: estimator/models/nfm.py."""
    model = _zoo.NFM(linear_feature_columns, dnn_feature_columns,
                     dnn_hidden_units=dnn_hidden_units,
                     l2_reg_embedding=l2_reg_embedding, l2_reg_linear=l2_reg_linear,
                     l2_reg_dnn=l2_reg_dnn, seed=seed, bi_dropout=bi_dropout,
                     dnn_dropout=dnn_dropout, dnn_activation=dnn_activation,
                     task=task)
    return _make(model, task, model_dir, config, linear_optimizer, dnn_optimizer,
                 training_chief_hooks)


def PNNEstimator(dnn_feature_columns, dnn_hidden_units=(256, 128, 64),
                 l2_reg_embedding=1e-5, l2_reg_dnn=0, seed=1024, dnn_dropout=0,
                 dnn_activation="relu", use_inner=True, use_outter=False,
                 kernel_type="mat", task="binary", model_dir=None, config=None,
                 linear_optimizer="Ftrl", dnn_optimizer="Adagrad",
                 training_chief_hooks=None):
    """Reference: estimator/models/pnn.py."""
    model = _zoo.PNN(dnn_feature_columns, dnn_hidden_units=dnn_hidden_units,
                     l2_reg_embedding=l2_reg_embedding, l2_reg_dnn=l2_reg_dnn,
                     seed=seed, dnn_dropout=dnn_dropout,
                     dnn_activation=dnn_activation, use_inner=use_inner,
                     use_outter=use_outter, kernel_type=kernel_type, task=task)
    return _make(model, task, model_dir, config, linear_optimizer, dnn_optimizer,
                 training_chief_hooks)


def WDLEstimator(linear_feature_columns, dnn_feature_columns,
                 dnn_hidden_units=(256, 128, 64), l2_reg_linear=1e-5,
                 l2_reg_embedding=1e-5, l2_reg_dnn=0, seed=1024, dnn_dropout=0,
                 dnn_activation="relu", task="binary", model_dir=None, config=None,
                 linear_optimizer="Ftrl", dnn_optimizer="Adagrad",
                 training_chief_hooks=None):
    """Reference: estimator/models/wdl.py."""
    model = _zoo.WDL(linear_feature_columns, dnn_feature_columns,
                     dnn_hidden_units=dnn_hidden_units, l2_reg_linear=l2_reg_linear,
                     l2_reg_embedding=l2_reg_embedding, l2_reg_dnn=l2_reg_dnn,
                     seed=seed, dnn_dropout=dnn_dropout,
                     dnn_activation=dnn_activation, task=task)
    return _make(model, task, model_dir, config, linear_optimizer, dnn_optimizer,
                 training_chief_hooks)


def xDeepFMEstimator(linear_feature_columns, dnn_feature_columns,
                     dnn_hidden_units=(256, 128, 64), cin_layer_size=(128, 128),
                     cin_split_half=True, cin_activation="relu", l2_reg_linear=1e-5,
                     l2_reg_embedding=1e-5, l2_reg_dnn=0, l2_reg_cin=0, seed=1024,
                     dnn_dropout=0, dnn_activation="relu", dnn_use_bn=False,
                     task="binary", model_dir=None, config=None,
                     linear_optimizer="Ftrl", dnn_optimizer="Adagrad",
                     training_chief_hooks=None):
    """Reference: estimator/models/xdeepfm.py."""
    model = _zoo.xDeepFM(linear_feature_columns, dnn_feature_columns,
                         dnn_hidden_units=dnn_hidden_units,
                         cin_layer_size=cin_layer_size,
                         cin_split_half=cin_split_half,
                         cin_activation=cin_activation, l2_reg_linear=l2_reg_linear,
                         l2_reg_embedding=l2_reg_embedding, l2_reg_dnn=l2_reg_dnn,
                         l2_reg_cin=l2_reg_cin, seed=seed, dnn_dropout=dnn_dropout,
                         dnn_activation=dnn_activation, dnn_use_bn=dnn_use_bn,
                         task=task)
    return _make(model, task, model_dir, config, linear_optimizer, dnn_optimizer,
                 training_chief_hooks)
