"""Namespace alias: the reference ships its reusable harness as ``gpytorch.test``
(reference: gpytorch/test/__init__.py); here the implementation lives in
:mod:`gpytorch_tpu.testing` and this module re-exports it so downstream code using the
reference path ports unchanged."""

from .testing import (  # noqa: F401
    BaseKernelTestCase,
    BaseLikelihoodTestCase,
    BaseMeanTestCase,
    BaseModelTestCase,
    BaseTestCase,
    VariationalModelTestCase,
    VariationalTestCase,
)

__all__ = [
    "BaseKernelTestCase",
    "BaseLikelihoodTestCase",
    "BaseMeanTestCase",
    "BaseModelTestCase",
    "BaseTestCase",
    "VariationalModelTestCase",
    "VariationalTestCase",
]
