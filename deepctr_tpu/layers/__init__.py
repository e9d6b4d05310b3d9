"""TPU layer zoo (replaces reference deepctr/layers/__init__.py exports).

No custom_objects registry is needed: persistence rebuilds models from
factories (training/checkpoint.py), not from layer-name lookups.
"""
from .activation import Dice, activation_fn
from .core import DNN, LocalActivationUnit, PredictionLayer, RegulationModule
from .interaction import (
    FM,
    AFMLayer,
    BiInteractionPooling,
    BilinearInteraction,
    BridgeModule,
    CIN,
    CrossNet,
    CrossNetMix,
    FEFMLayer,
    FGCNNLayer,
    FieldWiseBiInteraction,
    FwFMLayer,
    InnerProductLayer,
    InteractingLayer,
    OutterProductLayer,
    SENETLayer,
)
from .normalization import LayerNormalization
from .sequence import (
    AttentionSequencePoolingLayer,
    BiasEncoding,
    BiLSTM,
    DynamicGRU,
    KMaxPooling,
    PositionEncoding,
    SequencePoolingLayer,
    Transformer,
    WeightedSequenceLayer,
    k_max_pooling,
    sequence_pooling,
    weighted_sequence,
)
from .utils import (
    Concat,
    Hash,
    Linear,
    NoMask,
    add_func,
    combined_dnn_input,
    concat_func,
    div,
    flatten,
    reduce_max,
    reduce_mean,
    reduce_sum,
    softmax,
)

__all__ = [
    "Dice", "activation_fn",
    "DNN", "LocalActivationUnit", "PredictionLayer", "RegulationModule",
    "FM", "AFMLayer", "BiInteractionPooling", "BilinearInteraction",
    "BridgeModule", "CIN", "CrossNet", "CrossNetMix", "FEFMLayer",
    "FGCNNLayer", "FieldWiseBiInteraction", "FwFMLayer", "InnerProductLayer",
    "InteractingLayer", "OutterProductLayer", "SENETLayer",
    "LayerNormalization",
    "AttentionSequencePoolingLayer", "BiasEncoding", "BiLSTM", "DynamicGRU",
    "KMaxPooling", "PositionEncoding", "SequencePoolingLayer", "Transformer",
    "WeightedSequenceLayer", "k_max_pooling",
    "sequence_pooling", "weighted_sequence",
    "Linear", "add_func", "combined_dnn_input", "concat_func", "flatten",
    "Concat", "Hash", "NoMask", "div", "reduce_max", "reduce_mean",
    "reduce_sum", "softmax",
]
