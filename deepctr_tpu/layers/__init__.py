"""TPU layer zoo (replaces reference deepctr/layers/__init__.py exports).

Persistence rebuilds models from factories (training/checkpoint.py), not
from layer-name lookups; ``custom_objects`` below exists for reference
export parity (user code that reads or extends the registry).
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

# Reference export parity: deepctr.layers.custom_objects maps layer names to
# classes for keras model deserialization. Persistence here rebuilds models
# from factories (training/checkpoint.py) and never needs it, but user code
# that introspects or extends the registry (reference utils.py custom_objects
# update idiom) keeps working. Includes the reference-name alias
# activation_layer -> activation_fn.
from .activation import activation_layer  # noqa: F401

class _CustomObjects(dict):
    """Reference maps custom_objects['tf'] to the tensorflow module; import
    it lazily on first access so `import deepctr_tpu.layers` never pays the
    multi-second TF import. ``in`` / ``get`` see the key before it
    materializes; iteration/copies include it only once accessed (or when
    TF is already imported, in which case it is seated eagerly at no
    cost)."""

    def _materialize_tf(self):
        import tensorflow as tf  # deferred; TF ships in this image

        self["tf"] = tf
        return tf

    def __missing__(self, key):
        if key == "tf":
            return self._materialize_tf()
        raise KeyError(key)

    def __contains__(self, key):
        return key == "tf" or dict.__contains__(self, key)

    def get(self, key, default=None):
        if key == "tf" and not dict.__contains__(self, key):
            try:
                return self._materialize_tf()
            except ImportError:
                return default
        return dict.get(self, key, default)


custom_objects = _CustomObjects({
    "DNN": DNN,
    "PredictionLayer": PredictionLayer,
    "FM": FM,
    "AFMLayer": AFMLayer,
    "BiInteractionPooling": BiInteractionPooling,
    "CIN": CIN,
    "InteractingLayer": InteractingLayer,
    "LocalActivationUnit": LocalActivationUnit,
    "Dice": Dice,
    "SequencePoolingLayer": SequencePoolingLayer,
    "AttentionSequencePoolingLayer": AttentionSequencePoolingLayer,
    "CrossNet": CrossNet,
    "CrossNetMix": CrossNetMix,
    "BiasEncoding": BiasEncoding,
    "WeightedSequenceLayer": WeightedSequenceLayer,
    "Transformer": Transformer,
    "NoMask": NoMask,
    "BiLSTM": BiLSTM,
    "KMaxPooling": KMaxPooling,
    "FGCNNLayer": FGCNNLayer,
    "Hash": Hash,
    "Linear": Linear,
    "DynamicGRU": DynamicGRU,
    "SENETLayer": SENETLayer,
    "BilinearInteraction": BilinearInteraction,
    "Add": add_func,
    "FieldWiseBiInteraction": FieldWiseBiInteraction,
    "FwFMLayer": FwFMLayer,
    "softmax": softmax,
    "FEFMLayer": FEFMLayer,
    "reduce_sum": reduce_sum,
    "PositionEncoding": PositionEncoding,
    "RegulationModule": RegulationModule,
    "BridgeModule": BridgeModule,
    "InnerProductLayer": InnerProductLayer,
    "OutterProductLayer": OutterProductLayer,
    "LayerNormalization": LayerNormalization,
    "Concat": Concat,
})

import sys as _sys  # noqa: E402

if "tensorflow" in _sys.modules:  # already paid for: seat eagerly
    custom_objects["tf"] = _sys.modules["tensorflow"]

__all__ = [
    "Dice", "activation_fn", "activation_layer", "custom_objects",
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
