"""Bayesian GPLVM — unsupervised latent-variable GPs.

Reference: gpytorch/models/gplvm/bayesian_gplvm.py:8 and latent_variable.py:28,46,67.
Three latent inference modes: point (MLE), MAP (point + prior), and variational (isotropic
Gaussian q(X) whose KL(q‖p) enters the ELBO through KLGaussianAddedLossTerm — already in
mlls/added_loss_term.py).

JAX note: ``VariationalLatentVariable`` samples q(X) reparametrized; pass an explicit key
(``model.sample_latent_variable(key)``) inside jitted training steps — without one a fixed
key is used (frozen at trace time).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.module import Module
from ..distributions import Normal
from ..mlls.added_loss_term import KLGaussianAddedLossTerm
from .approximate_gp import ApproximateGP


class LatentVariable(Module):
    """Base for GPLVM latent-variable inference (reference latent_variable.py:10)."""

    def __init__(self, n: int, dim: int):
        super().__init__()
        self.n = int(n)
        self.latent_dim = int(dim)

    def forward(self, key: Optional[jax.Array] = None):
        raise NotImplementedError

    def __call__(self, key: Optional[jax.Array] = None):
        return self.forward(key=key)


class PointLatentVariable(LatentVariable):
    """MLE point estimate of X (reference :28)."""

    def __init__(self, n: int, latent_dim: int, X_init):
        super().__init__(n, latent_dim)
        self.register_parameter("X", jnp.asarray(X_init))

    def forward(self, key=None):
        return self.X


class MAPLatentVariable(LatentVariable):
    """MAP estimate of X under a prior (reference :46)."""

    def __init__(self, n: int, latent_dim: int, X_init, prior_x):
        super().__init__(n, latent_dim)
        self.register_parameter("X", jnp.asarray(X_init))
        self.register_prior("prior_x", prior_x, "X")

    def forward(self, key=None):
        return self.X


class VariationalLatentVariable(LatentVariable):
    """Isotropic Gaussian q(X) with reparametrized sampling; KL(q‖p) added to the loss
    (reference :67)."""

    def __init__(self, n: int, data_dim: int, latent_dim: int, X_init, prior_x):
        super().__init__(n, latent_dim)
        self.data_dim = int(data_dim)
        self.prior_x = prior_x
        self.register_parameter("q_mu", jnp.asarray(X_init))
        self.register_parameter(
            "q_log_sigma", 0.1 * jax.random.normal(jax.random.PRNGKey(0), (n, latent_dim), dtype=jnp.asarray(X_init).dtype)
        )
        self.register_added_loss_term("x_kl")

    def forward(self, key=None):
        q_x = Normal(self.q_mu, jax.nn.softplus(self.q_log_sigma))
        self.update_added_loss_term(
            "x_kl", KLGaussianAddedLossTerm(q_x, self.prior_x, self.n, self.data_dim)
        )
        if key is None:
            key = jax.random.PRNGKey(0)
        return q_x.rsample(key)


class BayesianGPLVM(ApproximateGP):
    """GPLVM over an ApproximateGP (reference bayesian_gplvm.py:8).

    Usage: subclass, define mean/covar modules and ``forward(x)``; train by maximizing the
    ELBO of ``model(model.sample_latent_variable(key))`` against the observed Y (one GP per
    data dimension via batch shapes)."""

    def __init__(self, X: LatentVariable, variational_strategy):
        super().__init__(variational_strategy)
        self.X = X

    def forward(self, x):
        raise NotImplementedError

    def sample_latent_variable(self, key: Optional[jax.Array] = None):
        return self.X(key=key)


# -- reference import paths (gpytorch/models/gplvm/) --------------------------------------
from .._submodule_alias import install_submodule_aliases as _install

_install(__name__, {
    "bayesian_gplvm": {"BayesianGPLVM": BayesianGPLVM},
    "latent_variable": {
        "LatentVariable": LatentVariable,
        "PointLatentVariable": PointLatentVariable,
        "MAPLatentVariable": MAPLatentVariable,
        "VariationalLatentVariable": VariationalLatentVariable,
    },
})
