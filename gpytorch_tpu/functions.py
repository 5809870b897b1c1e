"""Functional API shim (reference: gpytorch/functions/__init__.py).

The reference's ``RBFCovariance``/``MaternCovariance`` custom autograd Functions are
superseded here by the fused Pallas covariance matvecs with hand-written VJPs
(ops/pallas_kernels.py) — exposed under the reference names for API parity.  The
linear-algebra entries delegate to the package façade."""

from __future__ import annotations

from . import inv_quad, inv_quad_logdet, logdet, matmul, solve
from .likelihoods.non_gaussian import log_normal_cdf
from .ops.pallas_kernels import fused_kernel_matvec, fused_periodic_matvec

# reference-name aliases: the fused streaming matvec IS the custom covariance function
RBFCovariance = fused_kernel_matvec
MaternCovariance = fused_kernel_matvec


class LogNormalCDF:
    """Reference functions._log_normal_cdf.LogNormalCDF (autograd Function): here the
    stable log Φ is a plain differentiable function — ``apply`` kept for API parity."""

    @staticmethod
    def apply(x):
        return log_normal_cdf(x)


def inv_matmul(input, rhs, lhs=None):
    """Reference functions.inv_matmul — delegate to solve."""
    return solve(input, rhs, lhs)


__all__ = [
    "LogNormalCDF",
    "MaternCovariance",
    "RBFCovariance",
    "fused_kernel_matvec",
    "fused_periodic_matvec",
    "inv_matmul",
    "inv_quad",
    "inv_quad_logdet",
    "log_normal_cdf",
    "logdet",
    "matmul",
]


# -- reference one-file-per-function import paths (gpytorch/functions/) -------------------
from ._submodule_alias import install_submodule_aliases as _install

_install(__name__, {
    "_log_normal_cdf": {"LogNormalCDF": LogNormalCDF, "log_normal_cdf": log_normal_cdf},
    "matern_covariance": {"MaternCovariance": MaternCovariance},
    "rbf_covariance": {"RBFCovariance": RBFCovariance},
})
