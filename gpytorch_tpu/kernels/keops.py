"""KeOps namespace parity (reference: gpytorch/kernels/keops/__init__.py).

The reference wraps the C++/CUDA KeOps meta-compiler to get O(N)-memory streaming kernel
matvecs (reference keops/keops_kernel.py:13-80).  On TPU that capability is native to this
framework: `LazyEvaluatedKernelOperator` streams K·v through tiled Pallas kernels (RBF,
Matérn, periodic) without materializing K (ops/pallas_kernels.py), engaged by default for
large operands exactly like the reference's ``_use_keops`` size heuristic
(keops_kernel.py:31-43).

These classes therefore alias the standard kernels — code written against
``gpytorch.kernels.keops`` ports unchanged, and automatically gets the fused path.
"""

from __future__ import annotations

from .kernel import Kernel as KeOpsKernel
from .stationary import MaternKernel, PeriodicKernel, RBFKernel

__all__ = ["KeOpsKernel", "MaternKernel", "PeriodicKernel", "RBFKernel"]


# -- reference one-file-per-kernel import paths (gpytorch/kernels/keops/) -----------------
from .._submodule_alias import install_submodule_aliases as _install

_install(__name__, {
    "keops_kernel": {"KeOpsKernel": KeOpsKernel},
    "rbf_kernel": {"RBFKernel": RBFKernel},
    "matern_kernel": {"MaternKernel": MaternKernel},
    "periodic_kernel": {"PeriodicKernel": PeriodicKernel},
})
