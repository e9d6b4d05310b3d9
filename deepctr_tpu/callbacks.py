"""Top-level callbacks alias (Keras-surface ergonomics).

Reference users write ``from tensorflow.keras.callbacks import
EarlyStopping, ModelCheckpoint`` (ref docs/source/FAQ.md usage snippets);
the equivalents live in ``training/callbacks.py`` and are re-exported
here so the import is one obvious line.
"""
from .training.callbacks import (Callback, CSVLogger, EarlyStopping,
                                 LearningRateScheduler, ModelCheckpoint,
                                 ReduceLROnPlateau, TensorBoard)

__all__ = ["Callback", "CSVLogger", "EarlyStopping", "LearningRateScheduler",
           "ModelCheckpoint", "ReduceLROnPlateau", "TensorBoard"]
