"""Reference-layout submodule aliases.

The reference (gpytorch) spreads classes over one-file-per-class submodules
(``gpytorch/kernels/rbf_kernel.py`` …); this build consolidates implementations but keeps
every reference *import path* working (``from gpytorch_tpu.kernels.rbf_kernel import
RBFKernel``) by registering synthetic modules in ``sys.modules``.  The import machinery
consults ``sys.modules`` for each dotted prefix before invoking finders, so the aliases
resolve as soon as the parent package/module has been imported — including for parents
that are plain modules (``lazy.py``, ``test.py``), which could not otherwise have
submodules at all.
"""

from __future__ import annotations

import sys
import types
from typing import Dict, Mapping


def install_submodule_aliases(package_name: str, mapping: Mapping[str, Dict[str, object]]) -> None:
    """Register ``package_name.<sub>`` alias modules exposing the given exports.

    mapping: {submodule_name: {exported_name: object}}.  Existing real modules are never
    overwritten.
    """
    pkg = sys.modules[package_name]
    for sub, exports in mapping.items():
        full = f"{package_name}.{sub}"
        if full in sys.modules:
            continue
        mod = types.ModuleType(
            full,
            f"Alias module mirroring the reference layout; re-exports from {package_name}.",
        )
        mod.__package__ = package_name
        for name, obj in exports.items():
            setattr(mod, name, obj)
        sys.modules[full] = mod
        if not hasattr(pkg, sub):
            setattr(pkg, sub, mod)
