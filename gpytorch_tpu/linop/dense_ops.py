"""Elementwise (Hadamard) products of operators — used by ProductKernel composition."""

from __future__ import annotations

import jax.numpy as jnp

from .base import DenseLinearOperator, LinearOperator
from .diag import ConstantDiagLinearOperator, DiagLinearOperator


def hadamard_product(a: LinearOperator, b: LinearOperator) -> LinearOperator:
    """a ⊙ b.  Diagonal structure is preserved; otherwise evaluates densely
    (the reference's MulLinearOperator also densifies via root decompositions for
    moderate sizes)."""
    if isinstance(a, DiagLinearOperator) and isinstance(b, DiagLinearOperator):
        return DiagLinearOperator(a._diag_values() * b._diag_values())
    if isinstance(a, DiagLinearOperator):
        return DiagLinearOperator(a._diag_values() * b._diagonal())
    if isinstance(b, DiagLinearOperator):
        return DiagLinearOperator(b._diag_values() * a._diagonal())
    return DenseLinearOperator(a.to_dense() * b.to_dense())
