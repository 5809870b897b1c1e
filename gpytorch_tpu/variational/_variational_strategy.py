"""Variational strategy base (reference: gpytorch/variational/_variational_strategy.py:48).

``__call__`` (reference :325-377): lazily initializes q(u) from the prior on first use,
expands batch inducing points, and dispatches on MVN vs Delta q(u).

JAX design note: the reference stores a backreference to the model via
``object.__setattr__`` — a pytree cycle here.  Instead the owning ApproximateGP passes
itself at call time (``strategy(x, model=self)``), so functional parameter updates always
see the current model.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .. import settings
from ..core.module import Module
from ..distributions import Delta, MultivariateNormal, kl_divergence
from ..linop import LinearOperator, to_linear_operator


class _VariationalStrategy(Module):
    _pytree_ignore = ("_cache", "_model_ref")

    def __init__(self, model, inducing_points, variational_distribution, learn_inducing_locations: bool = True, jitter_val: Optional[float] = None):
        super().__init__()
        self._model_ref = model
        inducing_points = jnp.asarray(inducing_points)
        if inducing_points.ndim == 1:
            inducing_points = inducing_points[:, None]
        if learn_inducing_locations:
            self.register_parameter("inducing_points", inducing_points)
        else:
            self.register_buffer("inducing_points", inducing_points)
        self.learn_inducing_locations = bool(learn_inducing_locations)
        self._variational_distribution = variational_distribution
        self.register_buffer("variational_params_initialized", jnp.zeros((), dtype=jnp.int32))
        self._jitter_val = jitter_val

    @property
    def jitter_val(self) -> float:
        if self._jitter_val is None:
            return settings.variational_cholesky_jitter.value(self.inducing_points.dtype)
        return self._jitter_val

    def _resolve_model(self, model):
        m = model if model is not None else self._model_ref
        if m is None or isinstance(m, dict):
            raise RuntimeError("Variational strategy needs its owning model (pass model=...)")
        return m

    # -- q(u) --------------------------------------------------------------------------------
    @property
    def variational_distribution(self):
        return self._variational_distribution()

    def prior_distribution(self, model=None) -> MultivariateNormal:
        """p(u) — whitened strategies use N(0, I) (reference _variational_strategy.py)."""
        raise NotImplementedError

    def kl_divergence(self, model=None) -> jax.Array:
        """KL[q(u) ‖ p(u)] (reference :159).  For a Delta q(u) this is the negative prior
        log-density of the point estimate (matches the reference's registered KL)."""
        q_u = self.variational_distribution
        prior = self.prior_distribution(model)
        if isinstance(q_u, Delta):
            return -prior.log_prob(q_u.v)
        return kl_divergence(q_u, prior)

    def forward(self, x, inducing_points, inducing_values, variational_inducing_covar=None, model=None, **kwargs):
        raise NotImplementedError

    def _maybe_initialize(self, model):
        if int(self.variational_params_initialized) == 0:
            # initialization mutates variational parameters from the prior — it must happen
            # eagerly (one model(x) call outside jit) so the trained parameters stick.
            leaves = jax.tree_util.tree_leaves(self._variational_distribution)
            if any(isinstance(l, jax.core.Tracer) for l in leaves):
                raise RuntimeError(
                    "Variational parameters are uninitialized. Call the model once outside "
                    "jit (eagerly) to initialize them from the prior before jit-compiling "
                    "the training step."
                )
            prior = self.prior_distribution(model)
            self._variational_distribution.initialize_variational_distribution(prior)
            self.variational_params_initialized = jnp.ones((), dtype=jnp.int32)

    def __call__(self, x, prior: bool = False, model=None, **kwargs):
        model = self._resolve_model(model)
        if prior:
            return model.forward(x)
        self._maybe_initialize(model)
        x = jnp.asarray(x)
        if x.ndim == 1:
            x = x[:, None]
        inducing_points = self.inducing_points
        # expand batch dims (reference :347-349)
        if inducing_points.shape[:-2] != x.shape[:-2]:
            batch = jnp.broadcast_shapes(inducing_points.shape[:-2], x.shape[:-2])
            inducing_points = jnp.broadcast_to(inducing_points, batch + inducing_points.shape[-2:])
            x = jnp.broadcast_to(x, batch + x.shape[-2:])
        q_u = self.variational_distribution
        if isinstance(q_u, MultivariateNormal):
            return self.forward(
                x,
                inducing_points,
                q_u.loc,
                q_u.lazy_covariance_matrix,
                model=model,
                **kwargs,
            )
        if isinstance(q_u, Delta):
            return self.forward(x, inducing_points, q_u.v, None, model=model, **kwargs)
        raise RuntimeError(f"Invalid variational distribution type {type(q_u)}")

    # -- online variational conditioning (reference :169-323; Maddox et al. '21) -------------
    def pseudo_points(self, model=None):
        """Return (pseudo_target_covar, pseudo_target_mean): an equivalent heteroskedastic
        exact-GP observation model over the inducing points such that conditioning on
        (Z, ỹ) with noise D̃ reproduces q(f).  Implemented by the whitened/unwhitened
        strategies (reference variational_strategy.py:209, unwhitened...:71)."""
        raise NotImplementedError("Each variational strategy must implement its own pseudo points method")

    def amortized_exact_gp(self, model=None, mean_module=None, covar_module=None):
        """Exact GP over the inducing pseudo-observations (reference :169-222)."""
        model = self._resolve_model(model)
        mean_module = mean_module if mean_module is not None else model.mean_module
        covar_module = covar_module if covar_module is not None else model.covar_module
        pseudo_covar, pseudo_mean = self.pseudo_points(model)
        Z = jax.lax.stop_gradient(self.inducing_points)
        pseudo_y = pseudo_mean[..., 0] + mean_module(Z)

        from ..likelihoods.gaussian_likelihood import GaussianLikelihood
        from ..models.exact_gp import ExactGP

        class _PseudoExactGP(ExactGP):
            def __init__(self, tx, ty, lik, mean_mod, covar_mod):
                super().__init__(tx, ty, lik)
                self.mean_module = mean_mod
                self.covar_module = covar_mod

            def forward(self, x):
                return MultivariateNormal(self.mean_module(x), self.covar_module(x))

        lik = model.likelihood if hasattr(model, "likelihood") else GaussianLikelihood()
        exact = _PseudoExactGP(Z, pseudo_y, lik, mean_module, covar_module)
        exact.eval()

        # the pseudo observation noise is the full matrix D̃, not the likelihood's σ²I:
        # build the prediction strategy and overwrite its training covariance
        from ..models.exact_prediction_strategies import DefaultPredictionStrategy

        prior = exact.forward(Z)
        strategy = DefaultPredictionStrategy((Z,), prior, pseudo_y, lik)
        strategy.lik_train_train_covar = (
            prior.lazy_covariance_matrix.evaluate_kernel()
            + to_linear_operator(pseudo_covar)
        ).evaluate_kernel()
        exact._cache["prediction_strategy"] = strategy
        return exact

    def get_fantasy_model(self, inputs, targets, model=None, mean_module=None, covar_module=None, **kwargs):
        """Online variational conditioning: return an ExactGP over (Z ∪ inputs) whose
        posterior incorporates both the variational approximation and the new observations
        (reference :227-323; arXiv 2110.15172 'Conditioning Sparse Variational GPs for
        Online Decision-Making')."""
        from ._variational_distribution import CholeskyVariationalDistribution

        if not isinstance(self._variational_distribution, CholeskyVariationalDistribution):
            raise NotImplementedError(
                "Fantasy models are only supported for CholeskyVariationalDistribution (matches reference)"
            )
        exact = self.amortized_exact_gp(model=model, mean_module=mean_module, covar_module=covar_module)
        return exact.get_fantasy_model(inputs, targets, **kwargs)
