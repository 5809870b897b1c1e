"""Reference import-path shim: ``gpytorch.utils.getitem`` (reference: utils/getitem.py
forwards to linear_operator.utils.getitem)."""

# The reference exposes _noop_index (a full-slice sentinel used by LinearOperator getitem
# plumbing).
_noop_index = slice(None, None, None)

__all__ = ["_noop_index"]
