"""Reference import-path shim: ``gpytorch.utils.lanczos`` (reference: utils/lanczos.py
forwards to linear_operator.utils.lanczos).  Forwards to :mod:`gpytorch_tpu.solvers.lanczos`."""

from ..solvers.lanczos import lanczos_inv_root, lanczos_root, lanczos_tridiag

__all__ = ["lanczos_tridiag", "lanczos_root", "lanczos_inv_root"]
