"""Beta/experimental feature flags (reference: gpytorch/beta_features.py).

Both reference flags are obsolete by design here:
  * ``checkpoint_kernel`` (reference :26-53, deprecated there in favor of KeOps): chunked
    streaming K·v is this framework's DEFAULT — LazyEvaluatedKernelOperator._matmul streams
    row blocks (or a fused Pallas kernel) and never materializes K, so the flag is a no-op
    accepted for API compatibility.
  * ``default_preconditioner`` (reference :55): pivoted-Cholesky preconditioning is already
    governed by settings.max_preconditioner_size / min_preconditioning_size.
"""

from __future__ import annotations

import warnings

from .settings import _feature_flag


class checkpoint_kernel:
    """No-op compatibility shim: chunked kernel matmul is the default behavior
    (reference beta_features.py:26; lazy_evaluated_kernel_tensor.py:245-275)."""

    def __init__(self, split_size: int = 0):
        self.split_size = split_size
        if split_size:
            warnings.warn(
                "checkpoint_kernel is a no-op: streamed/chunked kernel matmuls are the "
                "default in gpytorch_tpu (see LazyEvaluatedKernelOperator._matmul).",
                DeprecationWarning,
            )

    def __enter__(self):
        return self

    def __exit__(self, *args):
        return False


class default_preconditioner(_feature_flag):
    """Reference beta_features.py:55 — use settings.max_preconditioner_size instead."""

    _default = False


__all__ = ["checkpoint_kernel", "default_preconditioner"]
