from .exact_gp import ExactGP
from .gp import GP

__all__ = ["ExactGP", "GP"]
