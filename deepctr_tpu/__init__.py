"""deepctr_tpu: a TPU-native (JAX/XLA/Pallas/pjit) CTR framework.

Brand-new implementation of the capabilities of shenweichen/DeepCTR
(reference mounted at /root/reference) designed TPU-first:
- feature columns compile to static schemas + shared embedding tables
- layers/models are flax modules traced once under jit
- training is a jit-compiled step over optax with explicit reg losses
- distribution is a jax.sharding.Mesh (data x model) with XLA collectives
"""

from .features import (
    DEFAULT_GROUP_NAME,
    DenseFeat,
    SparseFeat,
    VarLenSparseFeat,
    build_input_schema,
    get_feature_names,
)
from .training.checkpoint import load_model, save_model
from .training.model import CTRModel
from .utils import check_version, enable_compilation_cache

__version__ = "0.1.0"

__all__ = [
    "DEFAULT_GROUP_NAME",
    "DenseFeat",
    "SparseFeat",
    "VarLenSparseFeat",
    "build_input_schema",
    "get_feature_names",
    "CTRModel",
    "save_model",
    "load_model",
    "check_version",
    "enable_compilation_cache",
    "__version__",
]
