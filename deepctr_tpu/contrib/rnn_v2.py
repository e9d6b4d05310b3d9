"""TF2-fork alias of the RNN driver.

The reference keeps two near-identical forks of the TF while-loop RNN
machinery (/root/reference/deepctr/contrib/rnn.py for TF1, rnn_v2.py:802
for TF2) and selects one by TF version at import time
(layers/sequence.py). One ``lax.scan`` driver covers both here; this
module preserves the ``from deepctr.contrib.rnn_v2 import dynamic_rnn``
import path.
"""
from .rnn import dynamic_rnn  # noqa: F401

__all__ = ["dynamic_rnn"]
