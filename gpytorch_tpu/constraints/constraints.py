"""Parameter constraints — static raw↔constrained bijectors.

Reference: gpytorch/constraints/constraints.py (Interval :17, GreaterThan :156, Positive :181,
LessThan :197).  In the reference these are ``nn.Module``s holding tensor bounds; here they are
frozen (hashable) dataclasses with float bounds, so they live in the *static* part of the module
pytree and never interact with tracing.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax.numpy as jnp
from jax.nn import softplus, sigmoid


def inv_softplus(x):
    """Numerically-stable inverse of softplus (reference: gpytorch/utils/transforms.py)."""
    x = jnp.asarray(x)
    # softplus(y) = x  =>  y = x + log(1 - exp(-x)); stable via log1p(-exp(-x))
    return x + jnp.log(-jnp.expm1(-x))


def inv_sigmoid(x):
    x = jnp.asarray(x)
    return jnp.log(x) - jnp.log1p(-x)


@dataclasses.dataclass(frozen=True)
class Interval:
    """Constrain a parameter to (lower_bound, upper_bound) via a scaled sigmoid.

    Reference: gpytorch/constraints/constraints.py:17.
    """

    lower_bound: float = -math.inf
    upper_bound: float = math.inf
    initial_value: Optional[float] = None

    @property
    def enforced(self) -> bool:
        return True

    def check(self, value) -> bool:
        return bool(jnp.all(value > self.lower_bound) and jnp.all(value < self.upper_bound))

    def intersect(self, other: "Interval") -> "Interval":
        """Reference: constraints.py:93."""
        lower = max(self.lower_bound, other.lower_bound)
        upper = min(self.upper_bound, other.upper_bound)
        return type(self)(lower, upper, self.initial_value)

    def transform(self, raw):
        return self.lower_bound + (self.upper_bound - self.lower_bound) * sigmoid(raw)

    def inverse_transform(self, value):
        return inv_sigmoid((jnp.asarray(value) - self.lower_bound) / (self.upper_bound - self.lower_bound))

    def __repr__(self):
        return f"{type(self).__name__}({self.lower_bound:.3E}, {self.upper_bound:.3E})"


@dataclasses.dataclass(frozen=True)
class GreaterThan(Interval):
    """value = lower + softplus(raw) (reference: constraints.py:156)."""

    upper_bound: float = math.inf

    def transform(self, raw):
        return self.lower_bound + softplus(raw)

    def inverse_transform(self, value):
        return inv_softplus(jnp.asarray(value) - self.lower_bound)


@dataclasses.dataclass(frozen=True)
class Positive(GreaterThan):
    """value = softplus(raw) (reference: constraints.py:181)."""

    lower_bound: float = 0.0

    def transform(self, raw):
        return softplus(raw)

    def inverse_transform(self, value):
        return inv_softplus(value)


class LessThan(Interval):
    """value = upper - softplus(-raw) (reference: constraints.py:197 — takes the UPPER
    bound as its first argument, unlike the Interval dataclass field order)."""

    def __init__(self, upper_bound: float = math.inf, initial_value: Optional[float] = None):
        super().__init__(-math.inf, upper_bound, initial_value)

    def intersect(self, other: "Interval") -> "Interval":
        lower = max(self.lower_bound, other.lower_bound)
        upper = min(self.upper_bound, other.upper_bound)
        if lower == -math.inf:
            return LessThan(upper, self.initial_value)
        return Interval(lower, upper, self.initial_value)

    def transform(self, raw):
        return self.upper_bound - softplus(-raw)

    def inverse_transform(self, value):
        return -inv_softplus(self.upper_bound - jnp.asarray(value))
