"""GP base marker class (reference: gpytorch/models/gp.py:8)."""

from __future__ import annotations

from ..core.module import Module


class GP(Module):
    pass
