"""Namespace alias: the reference ships its reusable harness as ``gpytorch.test``
(reference: gpytorch/test/__init__.py); here the implementation lives in
:mod:`gpytorch_tpu.testing` and this module re-exports it so downstream code using the
reference path ports unchanged."""

from .testing import (  # noqa: F401
    BaseKeOpsTestCase,
    BaseKernelTestCase,
    BaseLikelihoodTestCase,
    BaseMeanTestCase,
    BaseModelTestCase,
    BaseTestCase,
    VariationalModelTestCase,
    VariationalTestCase,
)

__all__ = [
    "BaseKeOpsTestCase",
    "BaseKernelTestCase",
    "BaseLikelihoodTestCase",
    "BaseMeanTestCase",
    "BaseModelTestCase",
    "BaseTestCase",
    "VariationalModelTestCase",
    "VariationalTestCase",
]


# -- reference test-utils + one-file-per-harness import paths -----------------------------
import contextlib as _contextlib

import numpy as _np


def approx_equal(self, other, epsilon=1e-4):
    """Reference gpytorch/test/utils.py:12."""
    import jax.numpy as _jnp

    return bool(_jnp.max(_jnp.abs(_jnp.asarray(self) - _jnp.asarray(other))) <= epsilon)


@_contextlib.contextmanager
def least_used_cuda_device():
    """Reference gpytorch/test/utils.py:32 — CUDA device selection; no-op under JAX/TPU
    (device placement is explicit via jax.sharding)."""
    yield


def get_cuda_max_memory_allocations():
    """Reference parity: peak device-memory allocations; JAX analogue reads device stats."""
    import jax as _jax

    try:
        stats = _jax.local_devices()[0].memory_stats() or {}
        return int(stats.get("peak_bytes_in_use", 0))
    except Exception:
        return 0


import sys as _sys

from .testing import (
    base_keops_test_case,
    base_kernel_test_case,
    base_likelihood_test_case,
    base_mean_test_case,
    base_test_case,
    model_test_case,
    variational_test_case,
)

# the reference lays the harness out one-file-per-class under gpytorch/test/ — point those
# import paths at the real implementation modules
for _sub in (base_keops_test_case, base_kernel_test_case, base_likelihood_test_case,
             base_mean_test_case, base_test_case, model_test_case, variational_test_case):
    _sys.modules[__name__ + "." + _sub.__name__.rsplit(".", 1)[-1]] = _sub

from ._submodule_alias import install_submodule_aliases as _install

_install(__name__, {
    "utils": {
        "approx_equal": approx_equal,
        "least_used_cuda_device": least_used_cuda_device,
        "get_cuda_max_memory_allocations": get_cuda_max_memory_allocations,
    },
})
