"""Model zoo (factories mirroring reference deepctr/models/__init__.py)."""
from .afm import AFM
from .autoint import AutoInt
from .ccpm import CCPM
from .dcn import DCN
from .dcnmix import DCNMix
from .deepfefm import DeepFEFM
from .deepfm import DeepFM
from .difm import DIFM
from .edcn import EDCN
from .fgcnn import FGCNN
from .fibinet import FiBiNET
from .flen import FLEN
from .fnn import FNN
from .fwfm import FwFM
from .ifm import IFM
from .mlr import MLR
from .nfm import NFM
from .onn import ONN
from .pnn import PNN
from .wdl import WDL
from .xdeepfm import xDeepFM
from .sequence import BST, DIEN, DIN, DSIN
from .multitask import ESMM, MMOE, PLE, SharedBottom

NFFM = ONN  # reference alias (deepctr/models/__init__.py:27)

__all__ = [
    "AFM", "AutoInt", "CCPM", "DCN", "DCNMix", "DeepFEFM", "DeepFM", "DIFM",
    "EDCN", "FGCNN", "FiBiNET", "FLEN", "FNN", "FwFM", "IFM", "MLR", "NFM",
    "NFFM", "ONN", "PNN", "WDL", "xDeepFM",
    "BST", "DIEN", "DIN", "DSIN",
    "ESMM", "MMOE", "PLE", "SharedBottom",
]
