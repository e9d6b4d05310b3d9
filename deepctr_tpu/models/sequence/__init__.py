from .bst import BST
from .dien import DIEN
from .din import DIN
from .dsin import DSIN

__all__ = ["BST", "DIEN", "DIN", "DSIN"]
