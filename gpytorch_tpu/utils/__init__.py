from . import errors, grid, transforms, warnings
from .interpolation import Interpolation, left_interp, left_t_interp
from .nearest_neighbors import NNUtil
from .quadrature import GaussHermiteQuadrature1D
from .sum_interaction_terms import sum_interaction_terms
from .transforms import inv_sigmoid, inv_softplus

__all__ = [
    "GaussHermiteQuadrature1D",
    "NNUtil",
    "Interpolation",
    "errors",
    "grid",
    "left_interp",
    "inv_sigmoid",
    "inv_softplus",
    "left_t_interp",
    "sum_interaction_terms",
    "transforms",
    "warnings",
]
