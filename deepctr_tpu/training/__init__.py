from .model import CTRModel, TrainState
from . import checkpoint, data, metrics, optimizers

__all__ = ["CTRModel", "TrainState", "checkpoint", "data", "metrics", "optimizers"]
