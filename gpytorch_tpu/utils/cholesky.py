"""Reference import-path shim: ``gpytorch.utils.cholesky`` (reference: utils/cholesky.py
forwards to linear_operator.utils.cholesky)."""

from ..solvers.cholesky import psd_safe_cholesky

__all__ = ["psd_safe_cholesky"]
