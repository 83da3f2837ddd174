from . import s2, se3, so3, state
from .se3 import RigidTransform
from .state import ERROR_DIM, NavState

__all__ = ["s2", "se3", "so3", "state", "RigidTransform", "NavState", "ERROR_DIM"]
