"""Generic helpers (reference: gpytorch/utils/generic.py).

The reference module is empty apart from a note that ``length_safe_zip`` was replaced by
``zip(..., strict=True)``; this module exists for namespace parity.
"""

from __future__ import annotations
