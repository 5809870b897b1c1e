"""Deprecation helpers (reference: gpytorch/utils/deprecation.py).

``bool_compat`` in the reference papers over an old torch dtype quirk; in JAX the boolean
dtype is simply ``jnp.bool_``.
"""

from __future__ import annotations

import functools
import warnings

import jax.numpy as jnp

bool_compat = jnp.bool_


class DeprecationError(Exception):
    pass


def _deprecated_function_for(old_function_name, function):
    """Wrap ``function`` so calls under its old name warn (reference :22-31)."""

    @functools.wraps(function)
    def _deprecated_function(*args, **kwargs):
        warnings.warn(
            f"The `{old_function_name}` function is deprecated. Use `{function.__name__}` instead",
            DeprecationWarning,
        )
        return function(*args, **kwargs)

    return _deprecated_function


def _deprecate_kwarg(kwargs, old_kw, new_kw, new_kw_value):
    """Accept a renamed keyword argument with a warning (reference :34-41)."""
    old_kwarg = kwargs.get(old_kw)
    if old_kwarg is not None:
        warnings.warn(f"The `{old_kw}` argument is deprecated. Use `{new_kw}` instead.", DeprecationWarning)
        if new_kw_value is not None:
            raise ValueError(f"Cannot set both `{old_kw}` and `{new_kw}`")
        return old_kwarg
    return new_kw_value
