"""Importable attention-GRU cells + a functional ``dynamic_rnn`` driver.

Mirrors the reference ``deepctr.contrib`` package
(/root/reference/deepctr/contrib/__init__.py — empty namespace package;
users import the submodules directly):

    from deepctr.contrib.utils import QAAttGRUCell, VecAttGRUCell
    from deepctr.contrib.rnn import dynamic_rnn        # TF1 fork
    from deepctr.contrib.rnn_v2 import dynamic_rnn     # TF2 fork

Here both reference RNN forks map onto one ``lax.scan``-based driver
(``contrib/rnn.py``; ``rnn_v2.py`` re-exports it), and the cells are flax
modules whose math and parameter layout match ``layers.sequence._GRUScan``
— so custom DIEN variants built from these cells train on the same TPU
path (and numerics) as the built-in ``DynamicGRU`` layer.
"""
from . import rnn, rnn_v2, utils  # noqa: F401
from .rnn import dynamic_rnn  # noqa: F401
from .utils import QAAttGRUCell, VecAttGRUCell  # noqa: F401
