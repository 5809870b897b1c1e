"""gpytorch_tpu — a TPU-native Gaussian process framework (JAX/XLA/Pallas).

Re-creates the full capability surface of GPyTorch (cornellius-gp/gpytorch) with a
TPU-first architecture: pytree LinearOperator algebra, mBCG/SLQ matmul-based inference,
Pallas kernels for the hot covariance ops, and `jax.sharding` data-parallel solves.

The functional façade below mirrors gpytorch/__init__.py:34-283.
"""

from __future__ import annotations

from . import beta_features  # noqa: F401
from . import (
    constraints,
    distributions,
    kernels,
    lazy,
    likelihoods,
    linop,
    means,
    metrics,
    mlls,
    models,
    ops,
    optim,
    priors,
    settings,
    solvers,
    utils,
    variational,
)
from .core.module import Module, RandomModuleMixin
from .linop import to_dense, to_linear_operator
from .solvers import psd_safe_cholesky



# -------------------------------------------------------------------------------------
# Functional linear-algebra API (reference: gpytorch/__init__.py:34-283)
# -------------------------------------------------------------------------------------

def add_diagonal(input, diag):
    """Reference: gpytorch/__init__.py:34."""
    return to_linear_operator(input).add_diagonal(diag)


def add_jitter(input, jitter_val=1e-3):
    return to_linear_operator(input).add_jitter(jitter_val)


def inv_quad(input, inv_quad_rhs, reduce_inv_quad=True):
    """Reference: gpytorch/__init__.py:98."""
    return to_linear_operator(input).inv_quad(inv_quad_rhs, reduce_inv_quad=reduce_inv_quad)


def inv_quad_logdet(input, inv_quad_rhs=None, logdet=False, reduce_inv_quad=True):
    """Reference: gpytorch/__init__.py:118 — the mBCG/BBMM hot path."""
    return to_linear_operator(input).inv_quad_logdet(inv_quad_rhs, logdet, reduce_inv_quad=reduce_inv_quad)


def logdet(input):
    return to_linear_operator(input).logdet()


def matmul(input, other):
    return to_linear_operator(input).matmul(other)


def pivoted_cholesky(input, rank, error_tol=None, return_pivots=False):
    """Reference: gpytorch/__init__.py:146.  ``error_tol`` maps to the solver's relative
    stopping tolerance; ``return_pivots`` forwards the pivot order."""
    from .solvers.pivoted_cholesky import pivoted_cholesky as _pc

    return _pc(
        to_linear_operator(input),
        rank,
        rel_tol=0.0 if error_tol is None else float(error_tol),
        return_pivots=return_pivots,
    )


def root_decomposition(input, method=None):
    """Reference: gpytorch/__init__.py:176."""
    return to_linear_operator(input).root_decomposition(method=method)


def root_inv_decomposition(input, initial_vectors=None, test_vectors=None, method=None):
    """Reference: gpytorch/__init__.py:200."""
    return to_linear_operator(input).root_inv_decomposition(
        initial_vectors=initial_vectors, test_vectors=test_vectors, method=method
    )


def solve(input, rhs, lhs=None):
    """Reference: gpytorch/__init__.py:220."""
    return to_linear_operator(input).solve(rhs, lhs)


def sqrt_inv_matmul(input, rhs, lhs=None):
    """Reference: gpytorch/__init__.py:252 (CIQ)."""
    return to_linear_operator(input).sqrt_inv_matmul(rhs, lhs)


def inv_matmul(input, rhs, lhs=None):
    """Deprecated alias of :func:`solve` (reference: gpytorch/__init__.py inv_matmul)."""
    import warnings

    warnings.warn("inv_matmul is deprecated. Use solve instead.", DeprecationWarning)
    return solve(input, rhs, lhs)


def dsmm(sparse_indices, sparse_values, dense, output_dim):
    """Sparse @ dense matmul (interpolation weights form; reference gpytorch/__init__.py dsmm).

    TPU-native form: the sparse matrix is given in (indices, values) per-row COO form as used
    by SKI interpolation; lowered to gathers/segment-sums (see ops/interp.py)."""
    from .ops.interp import left_interp

    return left_interp(sparse_indices, sparse_values, dense)


from .functions import log_normal_cdf  # noqa: E402  (deprecated top-level re-export, reference :27)
from .mlls import ExactMarginalLogLikelihood  # noqa: E402  (reference :28)

__version__ = "0.2.0"

__all__ = [
    "ExactMarginalLogLikelihood",
    "Module",
    "RandomModuleMixin",
    "__version__",
    "add_diagonal",
    "add_jitter",
    "beta_features",
    "constraints",
    "distributions",
    "dsmm",
    "inv_matmul",
    "inv_quad",
    "inv_quad_logdet",
    "kernels",
    "lazy",
    "likelihoods",
    "linop",
    "log_normal_cdf",
    "logdet",
    "matmul",
    "metrics",
    "optim",
    "priors",
    "variational",
    "means",
    "mlls",
    "models",
    "ops",
    "pivoted_cholesky",
    "psd_safe_cholesky",
    "root_decomposition",
    "root_inv_decomposition",
    "settings",
    "solve",
    "solvers",
    "sqrt_inv_matmul",
    "to_dense",
    "to_linear_operator",
    "utils",
]
