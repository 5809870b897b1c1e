"""Bijector helpers (reference: gpytorch/utils/transforms.py — inv_softplus, inv_sigmoid).

The canonical implementations live with the constraints; re-exported here for reference
API parity."""

from ..constraints.constraints import inv_sigmoid, inv_softplus  # noqa: F401

__all__ = ["inv_sigmoid", "inv_softplus"]
