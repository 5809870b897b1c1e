"""Reference import-path alias: ``gpytorch.module`` (reference: gpytorch/module.py).

The implementation lives in :mod:`gpytorch_tpu.core.module`."""

from .core.module import Module, RandomModuleMixin

__all__ = ["Module", "RandomModuleMixin"]
