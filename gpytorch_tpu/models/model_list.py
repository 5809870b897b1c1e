"""IndependentModelList (reference: gpytorch/models/model_list.py:22)."""

from __future__ import annotations

import jax.numpy as jnp

from ..core.module import Module
from .gp import GP


class AbstractModelList(Module):
    def forward_i(self, i, *args, **kwargs):
        raise NotImplementedError

    def likelihood_i(self, i, *args, **kwargs):
        raise NotImplementedError


class IndependentModelList(AbstractModelList):
    def __init__(self, *models):
        super().__init__()
        self.models = list(models)
        for m in models:
            if not hasattr(m, "likelihood"):
                raise ValueError("IndependentModelList requires models with a likelihood")

    @property
    def likelihood(self):
        from ..likelihoods import LikelihoodList

        return LikelihoodList(*[m.likelihood for m in self.models])

    def forward_i(self, i, *args, **kwargs):
        return self.models[i].forward(*args, **kwargs)

    def likelihood_i(self, i, *args, **kwargs):
        return self.models[i].likelihood(*args, **kwargs)

    def forward(self, *args, **kwargs):
        return [m.forward(*a if isinstance(a, (list, tuple)) else (a,)) for m, a in zip(self.models, args)]

    def __call__(self, *args, **kwargs):
        return [m(*a) if isinstance(a, (list, tuple)) else m(a) for m, a in zip(self.models, args)]

    def get_fantasy_model(self, inputs, targets, **kwargs):
        """Joint fantasy models (reference :44)."""
        new_models = [
            m.get_fantasy_model(i, t, **kwargs) for m, i, t in zip(self.models, inputs, targets)
        ]
        return IndependentModelList(*new_models)

    def train(self, mode: bool = True):
        for m in self.models:
            m.train(mode)
        return super().train(mode)
