"""Exact-GP posterior inference strategies with train-dependent caches.

Reference: gpytorch/models/exact_prediction_strategies.py — factory ``prediction_strategy``
(:30), ``DefaultPredictionStrategy`` (:46) with ``mean_cache`` = (K+σ²I)⁻¹(y−μ) (:279-321)
and LOVE ``covar_cache`` = root_inv_decomposition (:269-272); ``exact_prediction`` (:331);
``InterpolatedPredictionStrategy`` (:481) for KISS-GP; ``SGPRPredictionStrategy`` (:1021);
``LinearPredictionStrategy`` (:830).

JAX design note: the reference hides caches behind ``@cached`` memo decorators with
backward-hook invalidation (gpytorch/utils/memoize.py:50-66).  Here caches are plain arrays
computed lazily on the strategy object — the strategy itself lives in the model's non-pytree
``_cache`` slot, and everything it stores is (optionally) ``stop_gradient``-ed under
``settings.detach_test_caches`` (reference :316).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .. import settings
from ..distributions import MultivariateNormal
from ..linop import (
    DenseLinearOperator,
    LazyEvaluatedKernelOperator,
    LinearOperator,
    RootLinearOperator,
    ZeroLinearOperator,
    to_linear_operator,
)


def prediction_strategy(train_inputs, train_prior_dist, train_labels, likelihood):
    """Dispatch on the kernel's preferred strategy (reference :30)."""
    covar = train_prior_dist.lazy_covariance_matrix
    if isinstance(covar, LazyEvaluatedKernelOperator):
        return covar.kernel.prediction_strategy(train_inputs, train_prior_dist, train_labels, likelihood)
    return DefaultPredictionStrategy(train_inputs, train_prior_dist, train_labels, likelihood)


def _maybe_detach(x):
    if settings.detach_test_caches.on():
        return jax.tree_util.tree_map(jax.lax.stop_gradient, x)
    return x


class DefaultPredictionStrategy:
    """Reference: exact_prediction_strategies.py:46."""

    def __init__(self, train_inputs, train_prior_dist, train_labels, likelihood, root=None, inv_root=None):
        self.train_inputs = train_inputs
        self.train_prior_dist = train_prior_dist
        self.train_labels = train_labels
        self.likelihood = likelihood
        self._mean_cache = None
        self._covar_cache = None
        # flattened event size (for multitask MVNs, loc is the flattened n·t vector)
        self.num_train = train_prior_dist.loc.shape[-1]
        # marginal over training data: K_XX + Σ (reference :66)
        mvn = likelihood.marginal(train_prior_dist)
        self.lik_train_train_covar = mvn.lazy_covariance_matrix.evaluate_kernel()

    # -- caches ------------------------------------------------------------------------
    @property
    def mean_cache(self):
        """(K+σ²I)⁻¹(y − μ) (reference :279-321)."""
        if self._mean_cache is None:
            mvn = self.likelihood.marginal(self.train_prior_dist)
            train_mean = mvn.loc
            diff = (self.train_labels - train_mean)[..., None]
            nan_policy = settings.observation_nan_policy.value()
            if nan_policy != "ignore":
                mask = ~jnp.isnan(self.train_labels)
                diff = jnp.where(mask[..., None], diff, jnp.zeros_like(diff))
                if nan_policy == "mask":
                    from ..linop import MaskedLinearOperator

                    covar = MaskedLinearOperator(self.lik_train_train_covar, mask)
                    cache = covar.solve(diff)[..., 0]
                else:
                    cache = self.lik_train_train_covar.solve(diff)[..., 0]
            else:
                cache = self.lik_train_train_covar.solve(diff)[..., 0]
            self._mean_cache = _maybe_detach(cache)
        return self._mean_cache

    @property
    def covar_cache(self):
        """LOVE root-inverse cache R with R Rᵀ ≈ (K+σ²I)⁻¹ (reference :269-272)."""
        if self._covar_cache is None:
            root = self.lik_train_train_covar.root_inv_decomposition().root.to_dense()
            self._covar_cache = _maybe_detach(root)
        return self._covar_cache

    # -- prediction ---------------------------------------------------------------------
    def exact_prediction(self, joint_mean, joint_covar):
        """Reference :331-362."""
        n = self.num_train
        test_mean = joint_mean[..., n:]
        if isinstance(joint_covar, LinearOperator) and joint_covar.shape[-1] <= settings.max_eager_kernel_size.value():
            dense = joint_covar.to_dense()
            test_test_covar = DenseLinearOperator(dense[..., n:, n:])
            test_train_covar = DenseLinearOperator(dense[..., n:, :n])
        else:
            test_test_covar = joint_covar[..., n:, n:]
            test_train_covar = joint_covar[..., n:, :n]
        return (
            self.exact_predictive_mean(test_mean, test_train_covar),
            self.exact_predictive_covar(test_test_covar, test_train_covar),
        )

    def exact_predictive_mean(self, test_mean, test_train_covar):
        """μ* = K*x (K+σ²I)⁻¹(y−μ) + μ(x*) (reference :371-412)."""
        res = to_linear_operator(test_train_covar).matmul(self.mean_cache[..., None])[..., 0]
        return res + test_mean

    def exact_predictive_covar(self, test_test_covar, test_train_covar):
        """Reference :414-478."""
        if settings.skip_posterior_variances.on():
            return ZeroLinearOperator(*test_test_covar.shape, dtype=self.train_labels.dtype)
        test_train_covar = to_linear_operator(test_train_covar)
        test_test_covar = to_linear_operator(test_test_covar)
        if settings.fast_pred_var.on():
            # LOVE: Σ* = K** − (K*x R)(K*x R)ᵀ (reference :464-478)
            root = self.covar_cache  # (n, k)
            covar_inv_quad_form_root = test_train_covar.matmul(root)  # (..., m, k)
            return (test_test_covar + RootLinearOperator(covar_inv_quad_form_root) * -1.0).evaluate_kernel()
        # exact: K** − K*x (K+σ²I)⁻¹ Kx* (reference :431-462)
        train_test = test_train_covar.to_dense()
        solve = self.lik_train_train_covar.solve(jnp.swapaxes(train_test, -1, -2))
        solve = _maybe_detach(solve)
        correction = train_test @ solve
        return DenseLinearOperator(test_test_covar.to_dense() - correction)

    # -- fantasy updates ----------------------------------------------------------------
    def get_fantasy_strategy(self, inputs, targets, full_inputs, full_targets, full_output, **kwargs):
        """Rank-one/fantasy update (reference :137-265).  TPU-native simplification: rebuild
        the caches on the joint data via one solve (the joint covariance is already lazy, so
        this is an O(m) extra CG, not an O(n³) refactorization)."""
        lik = self.likelihood
        if hasattr(lik, "get_fantasy_likelihood"):
            lik = lik.get_fantasy_likelihood(**kwargs)
        return DefaultPredictionStrategy(full_inputs, full_output, full_targets, lik)


class InterpolatedPredictionStrategy(DefaultPredictionStrategy):
    """KISS-GP/LOVE prediction with caches in inducing space (reference :481-828).

    The train covariance is W K_UU Wᵀ + σ²I.  Caches:
      mean: c = Wᵀ (K̂)⁻¹ (y−μ) ∈ R^m, prediction = w(x*)ᵀ K_UU c — O(1)-ish per point.
      covar (LOVE): inducing-space root R s.t. prediction var = k** − w*ᵀ R Rᵀ w*.
    """

    def __init__(self, train_inputs, train_prior_dist, train_labels, likelihood):
        super().__init__(train_inputs, train_prior_dist, train_labels, likelihood)
        self._interp_mean_cache = None
        self._interp_covar_cache = None

    def _train_interp(self):
        from ..linop import InterpolatedLinearOperator

        covar = self.train_prior_dist.lazy_covariance_matrix.evaluate_kernel()
        if isinstance(covar, InterpolatedLinearOperator):
            return covar
        # AddedDiag(Interpolated) — unwrap
        from ..linop import AddedDiagLinearOperator

        if isinstance(covar, AddedDiagLinearOperator) and isinstance(covar.base, InterpolatedLinearOperator):
            return covar.base
        raise RuntimeError("InterpolatedPredictionStrategy requires an interpolated covariance")

    @property
    def interp_mean_cache(self):
        if self._interp_mean_cache is None:
            from ..ops.interp import left_t_interp

            interp = self._train_interp()
            base = interp.base  # K_UU
            m = base.shape[-1]
            solve = self.mean_cache  # (n,) = (K̂)⁻¹(y−μ) from the parent cache
            wt = left_t_interp(interp.left_interp_indices, interp.left_interp_values, solve[..., None], m)
            self._interp_mean_cache = _maybe_detach(base.matmul(wt))  # K_UU Wᵀ solve, (m, 1)
        return self._interp_mean_cache

    @property
    def interp_covar_cache(self):
        if self._interp_covar_cache is None:
            from ..ops.interp import left_t_interp

            interp = self._train_interp()
            base = interp.base
            m = base.shape[-1]
            # R_love = K_UU Wᵀ root_inv(K̂): inducing-space LOVE root (reference :687-727)
            root = self.lik_train_train_covar.root_inv_decomposition().root.to_dense()  # (n, k)
            wt_root = left_t_interp(interp.left_interp_indices, interp.left_interp_values, root, m)
            self._interp_covar_cache = _maybe_detach(base.matmul(wt_root))  # (m, k)
        return self._interp_covar_cache

    def exact_prediction(self, joint_mean, joint_covar):
        n = self.num_train
        test_mean = joint_mean[..., n:]
        joint = joint_covar.evaluate_kernel() if isinstance(joint_covar, LazyEvaluatedKernelOperator) else joint_covar
        from ..linop import InterpolatedLinearOperator

        if not isinstance(joint, InterpolatedLinearOperator):
            return super().exact_prediction(joint_mean, joint_covar)
        test_interp_idx = joint.left_interp_indices[..., n:, :]
        test_interp_val = joint.left_interp_values[..., n:, :]
        return (
            self._interp_predictive_mean(test_mean, test_interp_idx, test_interp_val),
            self._interp_predictive_covar(joint, test_interp_idx, test_interp_val),
        )

    def _interp_predictive_mean(self, test_mean, idx, val):
        from ..ops.interp import left_interp

        res = left_interp(idx, val, self.interp_mean_cache)[..., 0]
        return res + test_mean

    def _interp_predictive_covar(self, joint, idx, val):
        from ..ops.interp import left_interp

        if settings.skip_posterior_variances.on():
            n_test = idx.shape[-2]
            return ZeroLinearOperator(*(idx.shape[:-2] + (n_test, n_test)), dtype=val.dtype)
        base = joint.base
        from ..linop import InterpolatedLinearOperator as ILO

        test_test = ILO(base, idx, val)
        if settings.fast_pred_var.on():
            cache = self.interp_covar_cache  # (m, k)
            root = left_interp(idx, val, cache)  # (n_test, k)
            return (test_test + RootLinearOperator(root) * -1.0).evaluate_kernel()
        # exact path: densify (test sets are small)
        Kss = test_test.to_dense()
        n = self.num_train
        test_train = ILO(
            base,
            idx,
            val,
            joint.right_interp_indices[..., :n, :],
            joint.right_interp_values[..., :n, :],
        ).to_dense()
        solve = self.lik_train_train_covar.solve(jnp.swapaxes(test_train, -1, -2))
        return DenseLinearOperator(Kss - test_train @ _maybe_detach(solve))


class LinearPredictionStrategy(DefaultPredictionStrategy):
    """RFF / linear kernels: Woodbury in feature space (reference :830)."""


class SGPRPredictionStrategy(DefaultPredictionStrategy):
    """SGPR: the train covariance is LowRankRootAddedDiag — its Woodbury ``solve`` and
    ``root_inv_decomposition`` are already O(n·k²), so the default strategy's math hits the
    fast path automatically (reference :1021-1103)."""

