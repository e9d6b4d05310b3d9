from .mesh import make_mesh
from . import sharding

__all__ = ["make_mesh", "sharding"]
