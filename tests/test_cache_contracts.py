"""Cache-behavior (call-count) contracts — the reference's mock-counter assertions.

The reference asserts CACHING as a tested contract: VariationalTestCase counts
cholesky/CG invocations via mock contexts (gpytorch/test/variational_test_case.py:268-299)
and the memoize framework auto-clears caches on backward (gpytorch/utils/memoize.py:12-145).
This file is the JAX analogue built on ``settings.count_linalg_calls``: a regression that
silently rebuilds the mean/LOVE caches every eval call, or turns a rank-m fantasy update
into a full refit, fails HERE even though every functional output stays correct.

Counts are trace/eager-call-time: these tests run the strategies eagerly, which is exactly
where the framework's explicit caches (prediction strategies) either save work or don't.
"""

import jax
import jax.numpy as jnp
import pytest

import gpytorch_tpu as gp
from gpytorch_tpu.distributions import MultivariateNormal
from gpytorch_tpu.kernels import GridInterpolationKernel, RBFKernel, ScaleKernel
from gpytorch_tpu.likelihoods import GaussianLikelihood
from gpytorch_tpu.means import ConstantMean
from gpytorch_tpu.mlls import ExactMarginalLogLikelihood, VariationalELBO
from gpytorch_tpu.models import ApproximateGP, ExactGP


class _GP(ExactGP):
    def __init__(self, x, y, lik, covar=None):
        super().__init__(x, y, lik)
        self.mean_module = ConstantMean()
        self.covar_module = covar if covar is not None else ScaleKernel(RBFKernel())

    def forward(self, x):
        return MultivariateNormal(self.mean_module(x), self.covar_module(x))


def _trained_model(n=60, covar=None, seed=0):
    k = jax.random.PRNGKey(seed)
    x = jax.random.uniform(k, (n, 1))
    y = jnp.sin(6.0 * x[:, 0]) + 0.05 * jax.random.normal(jax.random.PRNGKey(seed + 1), (n,))
    model = _GP(x, y, GaussianLikelihood(), covar=covar)
    model.likelihood.noise = 0.05
    return model, x, y


def test_counter_context_counts_and_restores():
    A = jnp.eye(4) + 0.1
    from gpytorch_tpu.solvers.cholesky import psd_safe_cholesky

    with gp.settings.count_linalg_calls() as outer:
        psd_safe_cholesky(A)
        with gp.settings.count_linalg_calls() as inner:
            psd_safe_cholesky(A)
            psd_safe_cholesky(A)
        psd_safe_cholesky(A)
    assert inner["psd_safe_cholesky"] == 2
    assert outer["psd_safe_cholesky"] == 2  # inner counts not folded into outer
    # counting fully off outside the context
    psd_safe_cholesky(A)
    assert outer["psd_safe_cholesky"] == 2


def test_exact_gp_eval_solves_cached_across_calls():
    """Second/third posterior calls reuse mean_cache/covar_cache: ZERO new CG solves,
    preconditioner builds, or Lanczos roots — even for NEW test inputs."""
    model, x, y = _trained_model()
    model = model.eval()
    xt1 = jnp.linspace(0.1, 0.9, 11)[:, None]
    xt2 = jnp.linspace(0.05, 0.95, 17)[:, None]

    with gp.settings.max_cholesky_size(0), gp.settings.fast_pred_var(True):
        with gp.settings.count_linalg_calls() as first:
            p1 = model.likelihood(model(xt1))
            _ = p1.mean, p1.variance
        assert first.get("linear_cg", 0) + first.get("psd_safe_cholesky", 0) >= 1, first
        assert first.get("lanczos_root", 0) >= 1, first  # the LOVE root build

        with gp.settings.count_linalg_calls() as second:
            p2 = model.likelihood(model(xt2))
            _ = p2.mean, p2.variance
    assert second.get("linear_cg", 0) == 0, second
    assert second.get("lanczos_tridiag", 0) + second.get("lanczos_root", 0) == 0, second
    assert second.get("pivoted_cholesky", 0) == 0, second
    # K(test, train) for the new inputs is the only kernel work allowed
    assert second.get("kernel_forward", 0) <= first.get("kernel_forward", 0)


def test_exact_gp_train_flip_invalidates_caches():
    """The deliberately-broken-cache detector: train()/eval() flips MUST rebuild — if
    invalidation regressed (stale caches surviving the flip), this fails."""
    model, x, y = _trained_model()
    model = model.eval()
    xt = jnp.linspace(0.1, 0.9, 9)[:, None]
    with gp.settings.max_cholesky_size(0):
        _ = model.likelihood(model(xt)).mean
        model = model.train().eval()  # flip: caches must drop
        with gp.settings.count_linalg_calls() as after_flip:
            _ = model.likelihood(model(xt)).mean
    assert after_flip.get("linear_cg", 0) >= 1, after_flip


def test_fantasy_update_is_rank_m_not_a_refit():
    """get_fantasy_model's documented cost is the block-Schur rank-m update: exactly ONE
    CG entry (the m solves B -> A^-1 B against the OLD system, batched) plus ONE m x m
    Cholesky — never a Lanczos/preconditioner rebuild, and the resulting model must serve
    from its UPDATED mean cache without any new solve (reference «fant_solve»,
    exact_prediction_strategies.py:137-265)."""
    model, x, y = _trained_model()
    model = model.eval()
    xt = jnp.linspace(0.1, 0.9, 9)[:, None]
    with gp.settings.max_cholesky_size(0), gp.settings.fast_pred_var(True):
        p = model.likelihood(model(xt))
        _ = p.mean, p.variance  # populate caches
        xf = jnp.array([[0.33], [0.77]])
        yf = jnp.sin(6.0 * xf[:, 0])
        with gp.settings.count_linalg_calls() as fant:
            fmodel = model.get_fantasy_model(xf, yf)
        assert fant.get("linear_cg", 0) == 1, fant  # A^-1 B only — a refit would re-solve the rhs too
        assert fant.get("psd_safe_cholesky", 0) == 1, fant  # the m x m Schur factor
        assert fant.get("pivoted_cholesky", 0) == 0, fant
        assert fant.get("lanczos_tridiag", 0) + fant.get("lanczos_root", 0) == 0, fant
        # and the fantasy model serves its mean from the updated cache without re-solving
        with gp.settings.count_linalg_calls() as serve:
            _ = fmodel.likelihood(fmodel(xt)).mean
    assert serve.get("linear_cg", 0) == 0, serve


def test_wiski_fantasy_no_refit():
    """WISKI online updates are O(m^2) inducing-space ops: no CG / Lanczos / pivoted
    Cholesky when fantasizing through InterpolatedPredictionStrategy (arXiv 2103.01454)."""
    # GridInterpolationKernel outermost — that is what selects InterpolatedPredictionStrategy
    covar = GridInterpolationKernel(
        ScaleKernel(RBFKernel()), grid_size=32, num_dims=1, grid_bounds=[(-0.1, 1.1)]
    )
    model, x, y = _trained_model(covar=covar)
    model = model.eval()
    xt = jnp.linspace(0.1, 0.9, 7)[:, None]
    p = model.likelihood(model(xt))
    _ = p.mean, p.variance
    xf = jnp.array([[0.4], [0.6]])
    yf = jnp.sin(6.0 * xf[:, 0])
    with gp.settings.count_linalg_calls() as fant:
        fmodel = model.get_fantasy_model(xf, yf)
        _ = fmodel.likelihood(fmodel(xt)).mean
    assert fant.get("linear_cg", 0) == 0, fant
    assert fant.get("lanczos_tridiag", 0) + fant.get("lanczos_root", 0) == 0, fant
    assert fant.get("pivoted_cholesky", 0) == 0, fant


def test_whitened_svgp_factors_kzz_once_per_forward():
    """One ELBO evaluation factors K_ZZ exactly once (reference _cholesky_factor is
    memoized per call graph; a refactor that factors it again in the KL or the mean path
    doubles the dominant O(m^3) cost silently)."""
    from gpytorch_tpu.variational import CholeskyVariationalDistribution, VariationalStrategy

    class _SVGP(ApproximateGP):
        def __init__(self):
            Z = jnp.linspace(0, 1, 8)[:, None]
            super().__init__(
                VariationalStrategy(
                    self, Z, CholeskyVariationalDistribution(8), learn_inducing_locations=True
                )
            )
            self.mean_module = ConstantMean()
            self.covar_module = ScaleKernel(RBFKernel())

        def forward(self, x):
            return MultivariateNormal(self.mean_module(x), self.covar_module(x))

    model = _SVGP()
    lik = GaussianLikelihood()
    mll = VariationalELBO(lik, model, num_data=32)
    x = jnp.linspace(0, 1, 32)[:, None]
    y = jnp.sin(4.0 * x[:, 0])
    with gp.settings.count_linalg_calls() as counts:
        _ = mll(model(x), y)
    assert counts.get("psd_safe_cholesky", 0) == 1, counts


def test_exact_mll_counts_one_solver_entry_per_step():
    """One training-objective evaluation = exactly one mBCG entry (the batched solve) and
    one preconditioner build — the BBMM contract (arXiv 1809.11165)."""
    model, x, y = _trained_model()
    mll = ExactMarginalLogLikelihood(model.likelihood, model)
    with gp.settings.max_cholesky_size(0), gp.settings.max_preconditioner_size(10), \
            gp.settings.min_preconditioning_size(1), gp.settings.count_linalg_calls() as counts:
        _ = mll(model(x), y, key=jax.random.PRNGKey(0))
    assert counts.get("linear_cg", 0) == 1, counts
    assert counts.get("pivoted_cholesky", 0) == 1, counts
