from . import errors, warnings
from .quadrature import GaussHermiteQuadrature1D

__all__ = ["GaussHermiteQuadrature1D", "errors", "warnings"]
