"""Prior base class (reference: gpytorch/priors/prior.py:17) — a Distribution+Module mixin
attachable to any parameter via ``Module.register_prior``."""

from __future__ import annotations

import jax

from ..core.module import Module


class Prior(Module):
    """Subclasses wrap an elementwise distribution and expose log_prob/sample."""

    def log_prob(self, x) -> jax.Array:
        raise NotImplementedError

    def sample(self, key, sample_shape=()):
        raise NotImplementedError

    def forward(self, *args, **kwargs):
        raise RuntimeError("Priors are not callable modules")
