"""Iterative solver stack: preconditioned mBCG, SLQ, Lanczos, pivoted Cholesky, CIQ/minres."""

from .cg import CGResult, linear_cg, linear_solve_cg, tridiag_from_coeffs
from .cholesky import psd_safe_cholesky
from .inv_quad import inv_quad_logdet_mbcg
from .lanczos import lanczos_inv_root, lanczos_root, lanczos_tridiag
from .pivoted_cholesky import pivoted_cholesky

__all__ = [
    "CGResult",
    "inv_quad_logdet_mbcg",
    "lanczos_inv_root",
    "lanczos_root",
    "lanczos_tridiag",
    "linear_cg",
    "linear_solve_cg",
    "pivoted_cholesky",
    "psd_safe_cholesky",
    "tridiag_from_coeffs",
]
