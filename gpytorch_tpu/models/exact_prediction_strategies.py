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
        from ..distributions import MultitaskMultivariateNormal

        if isinstance(train_prior_dist, MultitaskMultivariateNormal) and train_labels.ndim >= 2:
            # multitask labels (n, t) flatten to the distribution's interleaved layout
            train_labels = train_prior_dist._task_to_flat(train_labels)
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
        if settings.fast_pred_samples.on():
            # LOVE fast sampling (reference :733-744 / settings.fast_pred_samples
            # gpytorch/settings.py:225): return the posterior covariance directly as a
            # low-rank ROOT operator, so every ``rsample`` is one (m_test × q) matvec —
            # the Lanczos root runs once per test batch instead of once per sample call.
            root = self.covar_cache  # (n, k)
            C = test_train_covar.matmul(root)  # (..., m, k)
            posterior = (test_test_covar + RootLinearOperator(C) * -1.0).evaluate_kernel()
            sample_root = posterior.root_decomposition(method="lanczos").root.to_dense()
            return RootLinearOperator(_maybe_detach(sample_root))
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
        """Rank-m fantasy update of the mean cache via the block-Schur identity
        (reference «fant_solve», :137-265):

          [[Â, B ], [u]   [r₁]        v = S⁻¹(r₂ − Bᵀ u_old),  S = D − Bᵀ Â⁻¹ B
           [Bᵀ, D]] [v] = [r₂]  ⇒     u = u_old − (Â⁻¹B) v

        so the update costs m solves against the OLD n×n system plus an m×m Cholesky —
        never a refactorization/resolve of the (n+m)×(n+m) joint.  The LOVE covar cache is
        left to lazy recomputation on the joint operator (it is optional under
        fast_pred_var, matching the reference's treatment of ``covar_cache``)."""
        lik = self.likelihood
        if hasattr(lik, "get_fantasy_likelihood"):
            lik = lik.get_fantasy_likelihood(**kwargs)
        new_strategy = DefaultPredictionStrategy(full_inputs, full_output, full_targets, lik)

        m = jnp.asarray(targets).shape[-1]
        n = self.num_train
        if full_output.loc.shape[-1] == n + m:
            prior_joint = full_output.lazy_covariance_matrix
            # cross block has no noise (diagonal Σ); lazy slicing slices the inputs, so this
            # is an (n, m) kernel evaluation, not a joint rebuild
            B = prior_joint[..., :n, n:].evaluate_kernel().to_dense()
            new_block = MultivariateNormal(
                full_output.loc[..., n:], prior_joint[..., n:, n:].evaluate_kernel()
            )
            # fixed-noise models: the m×m D block takes the NEW observations' noise (the
            # fantasy likelihood holds n+m entries, which cannot shape-match this block)
            d_kwargs = {"noise": kwargs["noise"]} if "noise" in kwargs else {}
            D = lik.marginal(new_block, **d_kwargs).lazy_covariance_matrix.to_dense()
            u_old = self.mean_cache  # (n,)
            AinvB = self.lik_train_train_covar.solve(B)  # m solves against the OLD system
            S = D - jnp.swapaxes(B, -1, -2) @ AinvB
            r2 = jnp.asarray(full_targets)[..., n:] - new_block.loc
            from ..solvers.cholesky import psd_safe_cholesky

            Ls = psd_safe_cholesky(S)
            resid = r2 - (jnp.swapaxes(B, -1, -2) @ u_old[..., None])[..., 0]
            v = jax.scipy.linalg.cho_solve((Ls, True), resid[..., None])[..., 0]
            u = u_old - (AinvB @ v[..., None])[..., 0]
            new_strategy._mean_cache = _maybe_detach(jnp.concatenate([u, v], axis=-1))
        return new_strategy


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
        self._interp_sample_cache = None

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

    @property
    def interp_sample_cache(self):
        """LOVE fast-sampling cache (reference :733-744): an inducing-space root S with
        S Sᵀ ≈ K_UU − R̃ R̃ᵀ (R̃ = ``interp_covar_cache``), so the posterior covariance
        over any test batch is the pure root  (W* S)(W* S)ᵀ  — a sample is one sparse
        interp of an (m, q) matrix.  Test-independent: built once, reused for every test
        batch and every sample draw (the 1.92 s → 0.02 s LOVE-sampling anchor)."""
        if self._interp_sample_cache is None:
            interp = self._train_interp()
            base = interp.base  # K_UU
            cache = self.interp_covar_cache  # (m, k)
            inside = (base + RootLinearOperator(cache) * -1.0).evaluate_kernel()
            root = inside.root_decomposition(method="lanczos").root.to_dense()  # (m, q)
            self._interp_sample_cache = _maybe_detach(root)
        return self._interp_sample_cache

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
        if settings.fast_pred_samples.on():
            # LOVE fast sampling (reference :795-806): posterior covar = (W* S)(W* S)ᵀ
            root = left_interp(idx, val, self.interp_sample_cache)  # (n_test, q)
            return RootLinearOperator(root)
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

    def get_fantasy_strategy(self, inputs, targets, full_inputs, full_targets, full_output, **kwargs):
        """Fantasy updates promote to the WISKI strategy: O(n q²) one-time statistics build,
        then every subsequent update is O(m²) (reference :513-551, WISKI arXiv 2103.01454)."""
        wiski = WiskiPredictionStrategy.from_interpolated(self)
        return wiski.get_fantasy_strategy(inputs, targets, full_inputs, full_targets, full_output, **kwargs)


def _wtw_wtr(idx, vals, r, m):
    """Accumulate WᵀW (m×m) and Wᵀr (m,) from sparse interpolation rows — the WISKI
    sufficient statistics (reference :560-677; arXiv 2103.01454)."""
    outer = vals[..., :, None] * vals[..., None, :]  # (n, q, q)
    flat_idx = (idx[..., :, None] * m + idx[..., None, :]).reshape(-1)
    wtw = jnp.zeros((m * m,), dtype=vals.dtype).at[flat_idx].add(outer.reshape(-1)).reshape(m, m)
    from ..ops.interp import left_t_interp

    wtr = left_t_interp(idx, vals, r[..., None], m)[..., 0]
    return wtw, wtr


class WiskiPredictionStrategy(InterpolatedPredictionStrategy):
    """WISKI online updates (reference :560-677; Stanton et al., arXiv 2103.01454).

    For K̂ = W K_UU Wᵀ + σ²I the inducing-space normal equations give
      Wᵀ K̂⁻¹ r = (WᵀW K_UU + σ²I)⁻¹ Wᵀ r        (mean path)
      Wᵀ K̂⁻¹ W = (WᵀW K_UU + σ²I)⁻¹ WᵀW          (covariance path)
    so the posterior depends on the data only through WᵀW and Wᵀr — O(m²) running sums
    that rank-one updates simply add to.  No O(n) work per fantasy update."""

    def __init__(self, train_inputs, train_prior_dist, train_labels, likelihood, wtw, wtr, noise):
        super().__init__(train_inputs, train_prior_dist, train_labels, likelihood)
        self.wtw = wtw
        self.wtr = wtr
        self.noise = noise

    def _kuu(self):
        return self._train_interp().base

    def _m_system(self):
        Kuu = self._kuu().to_dense()
        m = Kuu.shape[-1]
        return self.wtw @ Kuu + self.noise * jnp.eye(m, dtype=Kuu.dtype), Kuu

    @property
    def interp_mean_cache(self):
        if self._interp_mean_cache is None:
            M, Kuu = self._m_system()
            c = jnp.linalg.solve(M, self.wtr[..., None])
            self._interp_mean_cache = _maybe_detach(Kuu @ c)  # (m, 1)
        return self._interp_mean_cache

    @property
    def interp_covar_cache(self):
        """Root of P = K_UU (WᵀW K_UU + σ²I)⁻¹ WᵀW K_UU, so posterior covar =
        w*ᵀ(K_UU − P)w* — all in inducing space."""
        if self._interp_covar_cache is None:
            from ..solvers.cholesky import psd_safe_cholesky

            M, Kuu = self._m_system()
            P = Kuu @ jnp.linalg.solve(M, self.wtw @ Kuu)
            P = 0.5 * (P + jnp.swapaxes(P, -1, -2))
            self._interp_covar_cache = _maybe_detach(psd_safe_cholesky(P))
        return self._interp_covar_cache

    def _interp_predictive_covar(self, joint, idx, val):
        from ..ops.interp import left_interp
        from ..linop import InterpolatedLinearOperator as ILO

        if settings.skip_posterior_variances.on():
            n_test = idx.shape[-2]
            return ZeroLinearOperator(*(idx.shape[:-2] + (n_test, n_test)), dtype=val.dtype)
        test_test = ILO(joint.base, idx, val)
        if settings.fast_pred_samples.on():
            # WISKI fast sampling (reference :795-805): posterior covar = (W* S)(W* S)ᵀ,
            # S Sᵀ ≈ K_UU − P (built by the inherited interp_sample_cache)
            root = left_interp(idx, val, self.interp_sample_cache)  # (n_test, q)
            return RootLinearOperator(root)
        root = left_interp(idx, val, self.interp_covar_cache)  # (n_test, m)
        return (test_test + RootLinearOperator(root) * -1.0).evaluate_kernel()

    def get_fantasy_strategy(self, inputs, targets, full_inputs, full_targets, full_output, **kwargs):
        """O(m²) update: interpolate the new points, add their WᵀW / Wᵀr contributions."""
        lik = self.likelihood
        if hasattr(lik, "get_fantasy_likelihood"):
            lik = lik.get_fantasy_likelihood(**kwargs)
        joint = full_output.lazy_covariance_matrix.evaluate_kernel()
        n_new = jnp.asarray(targets).shape[-1]
        new_idx = joint.left_interp_indices[..., -n_new:, :]
        new_val = joint.left_interp_values[..., -n_new:, :]
        m = self._kuu().shape[-1]
        mean_new = full_output.loc[..., -n_new:]
        d_wtw, d_wtr = _wtw_wtr(new_idx, new_val, jnp.asarray(targets) - mean_new, m)
        return WiskiPredictionStrategy(
            full_inputs, full_output, full_targets, lik,
            self.wtw + d_wtw, self.wtr + d_wtr, self.noise,
        )

    @classmethod
    def from_interpolated(cls, strategy: "InterpolatedPredictionStrategy"):
        """One-time O(n q²) build of the sufficient statistics from a standard strategy."""
        interp = strategy._train_interp()
        m = interp.base.shape[-1]
        mvn = strategy.likelihood.marginal(strategy.train_prior_dist)
        r = strategy.train_labels - mvn.loc
        wtw, wtr = _wtw_wtr(interp.left_interp_indices, interp.left_interp_values, r, m)
        noise = strategy.likelihood.noise
        noise = jnp.reshape(noise, (-1,))[0]
        return cls(
            strategy.train_inputs, strategy.train_prior_dist, strategy.train_labels,
            strategy.likelihood, wtw, wtr, noise,
        )


class LinearPredictionStrategy(DefaultPredictionStrategy):
    """RFF / linear kernels: Woodbury in feature space (reference :830-1019).

    For K = Φ Φᵀ (features Φ ∈ R^{n×k}) and K̂ = K + σ²I:
      mean cache  w = (σ²I + ΦᵀΦ)⁻¹ Φᵀ (y−μ)           → μ* = φ*ᵀ w + μ(x*)
      covar cache R = chol(σ² (σ²I + ΦᵀΦ)⁻¹)            → Σ* = (φ*ᵀR)(φ*ᵀR)ᵀ
    Everything is O(n k²) once + O(k²) per test point — never an n×n solve."""

    def __init__(self, train_inputs, train_prior_dist, train_labels, likelihood, **kwargs):
        super().__init__(train_inputs, train_prior_dist, train_labels, likelihood)
        self._feat_mean_cache = None
        self._feat_covar_root = None

    @staticmethod
    def _root_of(covar) -> Optional[jax.Array]:
        """Extract the feature matrix Φ from a (possibly noise-wrapped) low-rank operator."""
        from ..linop import AddedDiagLinearOperator, LowRankRootLinearOperator, RootLinearOperator
        from ..linop.root import LowRankRootAddedDiagLinearOperator

        covar = covar.evaluate_kernel() if hasattr(covar, "evaluate_kernel") else covar
        if isinstance(covar, AddedDiagLinearOperator):
            covar = covar.base.evaluate_kernel()
        if isinstance(covar, LowRankRootAddedDiagLinearOperator):
            covar = covar.low_rank
        if isinstance(covar, (RootLinearOperator, LowRankRootLinearOperator)):
            return covar.root.to_dense() if isinstance(covar.root, LinearOperator) else jnp.asarray(covar.root)
        return None

    def _noise_scalar(self):
        noise = self.likelihood.noise
        return jnp.reshape(noise, (-1,))[0]

    def _feature_caches(self):
        if self._feat_mean_cache is None:
            phi = self._root_of(self.train_prior_dist.lazy_covariance_matrix)
            if phi is None:
                return None, None
            sigma2 = self._noise_scalar()
            k = phi.shape[-1]
            gram = jnp.swapaxes(phi, -1, -2) @ phi + sigma2 * jnp.eye(k, dtype=phi.dtype)
            from ..solvers.cholesky import psd_safe_cholesky

            Lg = psd_safe_cholesky(gram)
            mvn = self.likelihood.marginal(self.train_prior_dist)
            diff = (self.train_labels - mvn.loc)[..., None]
            w = jax.scipy.linalg.cho_solve((Lg, True), jnp.swapaxes(phi, -1, -2) @ diff)
            # R Rᵀ = σ² gram⁻¹:  R = √σ² Lg⁻ᵀ
            eye = jnp.eye(k, dtype=phi.dtype)
            R = jnp.sqrt(sigma2) * jax.scipy.linalg.solve_triangular(
                jnp.swapaxes(Lg, -1, -2), eye, lower=False
            )
            self._feat_mean_cache = _maybe_detach(w)
            self._feat_covar_root = _maybe_detach(R)
        return self._feat_mean_cache, self._feat_covar_root

    def exact_prediction(self, joint_mean, joint_covar):
        n = self.num_train
        phi_joint = self._root_of(joint_covar)
        w, R = self._feature_caches()
        if phi_joint is None or w is None:
            return super().exact_prediction(joint_mean, joint_covar)
        test_mean = joint_mean[..., n:]
        phi_test = phi_joint[..., n:, :]
        pred_mean = (phi_test @ w)[..., 0] + test_mean
        if settings.skip_posterior_variances.on():
            m = phi_test.shape[-2]
            return pred_mean, ZeroLinearOperator(m, m, dtype=phi_test.dtype)
        pred_covar = RootLinearOperator(phi_test @ R)
        return pred_mean, pred_covar


class SGPRPredictionStrategy(DefaultPredictionStrategy):
    """SGPR: the train covariance is LowRankRootAddedDiag — its Woodbury ``solve`` and
    ``root_inv_decomposition`` are already O(n·k²), so the default strategy's math hits the
    fast path automatically (reference :1021-1103)."""

