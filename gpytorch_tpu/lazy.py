"""``gpytorch.lazy`` namespace parity (reference: gpytorch/lazy/ — the
LazyEvaluatedKernelTensor plus deprecation forwarders to linear_operator).

Everything lives in :mod:`gpytorch_tpu.linop`; this module provides the reference names."""

from .linop import LazyEvaluatedKernelOperator
from .linop import LazyEvaluatedKernelOperator as LazyEvaluatedKernelTensor  # reference name
from .linop import *  # noqa: F401,F403 — LinearOperator classes under their lazy-era names

__all__ = ["LazyEvaluatedKernelOperator", "LazyEvaluatedKernelTensor"]
