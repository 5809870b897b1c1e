from . import errors, grid, warnings
from .interpolation import Interpolation, left_interp, left_t_interp
from .quadrature import GaussHermiteQuadrature1D

__all__ = [
    "GaussHermiteQuadrature1D",
    "Interpolation",
    "errors",
    "grid",
    "left_interp",
    "left_t_interp",
    "warnings",
]
