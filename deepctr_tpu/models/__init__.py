"""Model zoo (29 factories mirroring reference deepctr/models/__init__.py)."""
from .wdl import WDL
from .deepfm import DeepFM

__all__ = ["WDL", "DeepFM"]
