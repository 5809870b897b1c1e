"""``gpytorch.lazy`` namespace parity (reference: gpytorch/lazy/ — the
LazyEvaluatedKernelTensor plus deprecation forwarders to linear_operator).

Everything lives in :mod:`gpytorch_tpu.linop`; this module provides the reference names."""

from .linop import LazyEvaluatedKernelOperator
from .linop import LazyEvaluatedKernelOperator as LazyEvaluatedKernelTensor  # reference name
from .linop import *  # noqa: F401,F403 — LinearOperator classes under their lazy-era names

def recall_grad_state(method):
    """Reference lazy/lazy_evaluated_kernel_tensor.py:17 — re-enters the grad mode active
    at construction.  JAX has no global grad mode (differentiation is a transform), so
    this is an identity decorator kept for API parity."""
    return method


from ._submodule_alias import install_submodule_aliases as _install

_install(__name__, {
    "lazy_evaluated_kernel_tensor": {
        "LazyEvaluatedKernelTensor": LazyEvaluatedKernelTensor,
        "recall_grad_state": recall_grad_state,
    },
})

__all__ = ["LazyEvaluatedKernelOperator", "LazyEvaluatedKernelTensor", "recall_grad_state"]
