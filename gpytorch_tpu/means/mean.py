"""Mean function base (reference: gpytorch/means/mean.py:8)."""

from __future__ import annotations

from ..core.module import Module


class Mean(Module):
    def forward(self, x):
        raise NotImplementedError

    def __call__(self, x, **kwargs):
        import jax.numpy as jnp

        x = jnp.asarray(x)
        if x.ndim == 1:
            x = x[:, None]
        return self.forward(x, **kwargs)
