"""Shipped reusable test harness — public API for downstream libraries.

Reference: the ``gpytorch/test/`` package (base_test_case.py:12, base_kernel_test_case.py:13,
base_mean_test_case.py, base_likelihood_test_case.py, model_test_case.py:12,
variational_test_case.py:16), which downstream consumers like BoTorch subclass.
"""

from .base_keops_test_case import BaseKeOpsTestCase
from .base_kernel_test_case import BaseKernelTestCase
from .base_likelihood_test_case import BaseLikelihoodTestCase
from .base_mean_test_case import BaseMeanTestCase
from .base_test_case import BaseTestCase
from .model_test_case import BaseModelTestCase, VariationalModelTestCase
from .variational_test_case import VariationalTestCase

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
