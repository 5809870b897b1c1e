from . import deprecation, errors, generic, grid, interpolation, profiling, quadrature, transforms, warnings
from .interpolation import Interpolation, left_interp, left_t_interp
from .memoize import cached, clear_cache_hook, pop_from_cache
from .nearest_neighbors import IVFNNUtil, NNUtil
from .quadrature import GaussHermiteQuadrature1D
from .sum_interaction_terms import sum_interaction_terms
from .transforms import inv_sigmoid, inv_softplus

__all__ = [
    "GaussHermiteQuadrature1D",
    "IVFNNUtil",
    "NNUtil",
    "Interpolation",
    "cached",
    "clear_cache_hook",
    "deprecation",
    "errors",
    "generic",
    "grid",
    "interpolation",
    "left_interp",
    "inv_sigmoid",
    "inv_softplus",
    "left_t_interp",
    "pop_from_cache",
    "profiling",
    "quadrature",
    "sum_interaction_terms",
    "transforms",
    "warnings",
]
