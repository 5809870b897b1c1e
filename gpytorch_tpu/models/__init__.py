from .approximate_gp import ApproximateGP
from .exact_gp import ExactGP
from .gp import GP

__all__ = ["ApproximateGP", "ExactGP", "GP"]
