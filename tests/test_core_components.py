"""Coverage for core subsystems flagged untested in round 1: priors (log_prob vs scipy),
constraints round-trip, metrics, settings semantics, state_dict round-trip, multitask GP
end-to-end, and spectral-mixture regression (reference test/priors/, test/examples/)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from scipy import stats

import gpytorch_tpu as gp
from gpytorch_tpu.constraints import GreaterThan, Interval, LessThan, Positive
from gpytorch_tpu.distributions import MultitaskMultivariateNormal, MultivariateNormal
from gpytorch_tpu.kernels import MultitaskKernel, RBFKernel, ScaleKernel, SpectralMixtureKernel
from gpytorch_tpu.likelihoods import GaussianLikelihood, MultitaskGaussianLikelihood
from gpytorch_tpu.linop import DenseLinearOperator
from gpytorch_tpu.means import ConstantMean, MultitaskMean
from gpytorch_tpu.metrics import (
    mean_absolute_error,
    mean_squared_error,
    mean_standardized_log_loss,
    negative_log_predictive_density,
    quantile_coverage_error,
    standardized_mean_squared_error,
)
from gpytorch_tpu.mlls import ExactMarginalLogLikelihood
from gpytorch_tpu.models import ExactGP
from gpytorch_tpu.priors import (
    GammaPrior,
    HalfCauchyPrior,
    HalfNormalPrior,
    HorseshoePrior,
    LogNormalPrior,
    NormalPrior,
    SmoothedBoxPrior,
    UniformPrior,
)

# ---------------------------------------------------------------------------- priors
_X = np.asarray([0.3, 0.9, 1.7, 2.5])


@pytest.mark.parametrize(
    "prior,scipy_logpdf",
    [
        (NormalPrior(0.5, 1.2), lambda x: stats.norm.logpdf(x, 0.5, 1.2)),
        (HalfNormalPrior(1.3), lambda x: stats.halfnorm.logpdf(x, scale=1.3)),
        (LogNormalPrior(0.2, 0.8), lambda x: stats.lognorm.logpdf(x, 0.8, scale=np.exp(0.2))),
        (UniformPrior(0.1, 3.0), lambda x: stats.uniform.logpdf(x, 0.1, 2.9)),
        (HalfCauchyPrior(0.7), lambda x: stats.halfcauchy.logpdf(x, scale=0.7)),
        (GammaPrior(2.0, 1.5), lambda x: stats.gamma.logpdf(x, 2.0, scale=1.0 / 1.5)),
    ],
)
def test_prior_log_prob_matches_scipy(prior, scipy_logpdf):
    lp = np.asarray(prior.log_prob(jnp.asarray(_X)))
    np.testing.assert_allclose(lp, scipy_logpdf(_X), rtol=1e-5, atol=1e-6)


def test_horseshoe_and_smoothed_box_finite():
    hs = HorseshoePrior(1.0)
    sb = SmoothedBoxPrior(0.0, 2.0, sigma=0.1)
    assert np.all(np.isfinite(np.asarray(hs.log_prob(jnp.asarray(_X)))))
    lp = np.asarray(sb.log_prob(jnp.asarray([-1.0, 1.0, 3.0])))
    assert lp[1] > lp[0] and lp[1] > lp[2]


def test_prior_sampling_within_support():
    for prior, check in [
        (GammaPrior(2.0, 1.5), lambda s: np.all(s > 0)),
        (UniformPrior(0.1, 3.0), lambda s: np.all((s >= 0.1) & (s <= 3.0))),
        (HalfNormalPrior(1.0), lambda s: np.all(s >= 0)),
    ]:
        s = np.asarray(prior.sample(jax.random.PRNGKey(0), (100,)))
        assert check(s), type(prior).__name__


# ------------------------------------------------------------------------- constraints
@pytest.mark.parametrize(
    "constraint,values",
    [
        (Positive(), [0.01, 1.0, 17.0]),
        (GreaterThan(0.5), [0.51, 2.0, 9.0]),
        (LessThan(3.0), [-4.0, 0.0, 2.9]),
        (Interval(0.2, 0.8), [0.25, 0.5, 0.75]),
    ],
)
def test_constraint_roundtrip(constraint, values):
    v = jnp.asarray(values)
    raw = constraint.inverse_transform(v)
    np.testing.assert_allclose(np.asarray(constraint.transform(raw)), values, rtol=1e-5, atol=1e-7)


def test_constraint_enforced_on_parameter():
    lik = GaussianLikelihood()
    lik.noise = 0.37
    assert float(jnp.reshape(lik.noise, (-1,))[0]) == pytest.approx(0.37, rel=1e-4)
    with pytest.raises(ValueError, match="must lie within"):
        lik.noise = 1e-9  # below the default GreaterThan(1e-4) bound


# ----------------------------------------------------------------------------- metrics
def _pred_and_y():
    mean = jnp.asarray([0.0, 1.0, 2.0])
    covar = jnp.diag(jnp.asarray([0.25, 0.25, 0.25]))
    y = jnp.asarray([0.5, 1.0, 1.5])
    return MultivariateNormal(mean, covar), y


def test_metrics_values():
    pred, y = _pred_and_y()
    np.testing.assert_allclose(float(mean_absolute_error(pred, y)), 1.0 / 3, rtol=1e-6)
    np.testing.assert_allclose(float(mean_squared_error(pred, y)), (0.25 + 0 + 0.25) / 3, rtol=1e-6)
    # NLPD = −mean log N(y; μ, σ²)
    expected_nlpd = -np.mean(stats.norm.logpdf([0.5, 0.0, -0.5], 0, 0.5))
    np.testing.assert_allclose(float(negative_log_predictive_density(pred, y)), expected_nlpd, rtol=1e-5)
    assert np.isfinite(float(standardized_mean_squared_error(pred, y)))
    assert np.isfinite(float(mean_standardized_log_loss(pred, y)))
    qce = float(quantile_coverage_error(pred, y, quantile=95.0))
    assert 0.0 <= qce <= 1.0


def test_joint_nlpd_exact_cholesky_is_deterministic():
    """The bench's joint-NLPD estimator (fast_pred_var posterior under a large
    max_cholesky_size) must dispatch to a dense exact Cholesky log_prob: bit-identical
    across calls (no probe-key dependence) and consistent with the stochastic mBCG path."""
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (200, 3))
    y = jnp.sin(3.0 * x.sum(-1)) + 0.1 * jax.random.normal(key, (200,))
    tx = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    ty = jnp.sin(3.0 * tx.sum(-1))

    class _M(ExactGP):
        def __init__(self, x, y, lik):
            super().__init__(x, y, lik)
            self.mean_module = ConstantMean()
            self.covar_module = ScaleKernel(RBFKernel(ard_num_dims=3))

        def forward(self, x):
            return MultivariateNormal(self.mean_module(x), self.covar_module(x))

    m = _M(x, y, GaussianLikelihood()).eval()

    def _nll(exact: bool) -> float:
        with gp.settings.fast_pred_var(True), gp.settings.max_root_decomposition_size(50):
            pred = m.likelihood(m(tx))
            if exact:
                with gp.settings.max_cholesky_size(4096):
                    return float(negative_log_predictive_density(pred, ty))
            with gp.settings.max_cholesky_size(0), gp.settings.max_preconditioner_size(50):
                return float(negative_log_predictive_density(pred, ty))

    a, b = _nll(exact=True), _nll(exact=True)
    assert a == b  # dense Cholesky path: no estimator randomness
    assert abs(a - _nll(exact=False)) < 5e-2  # stochastic path agrees at this size

    # eig_floor path (the bench's on-chip joint-NLPD recipe): on a well-conditioned
    # exact-covar posterior it must agree with the dense Cholesky value, and stay
    # deterministic.  Floor = likelihood noise = the exact spectrum's lower bound.
    with gp.settings.fast_pred_var(False), gp.settings.max_cholesky_size(4096):
        pred = m.likelihood(m(tx))
        noise = float(jnp.ravel(m.likelihood.noise)[0])
        c = float(negative_log_predictive_density(pred, ty))
        e1 = float(negative_log_predictive_density(pred, ty, eig_floor=1e-4 * noise))
        e2 = float(negative_log_predictive_density(pred, ty, eig_floor=1e-4 * noise))
    assert e1 == e2
    np.testing.assert_allclose(e1, c, rtol=1e-3, atol=1e-3)


def test_nlpd_eig_floor_repairs_indefinite_covariance():
    """A joint covariance computed by subtraction can be numerically indefinite at scale
    (measured on-chip at N=100k: LOVE rank-100 eig range [−3.34, 1.90]); the eig_floor
    path must return a finite value equal to the log density of the PSD-projected
    (eigenvalue-clamped) matrix, where the Cholesky path NaNs."""
    key = jax.random.PRNGKey(3)
    n = 32
    A = jax.random.normal(key, (n, n)) / jnp.sqrt(n)
    cov = A @ A.T + 0.05 * jnp.eye(n)
    w0, V0 = jnp.linalg.eigh(cov)
    w_bad = w0.at[0].set(-0.5)  # one large spurious negative eigenvalue
    cov_bad = (V0 * w_bad) @ V0.T
    mean = jnp.zeros(n)
    y = jax.random.normal(jax.random.PRNGKey(4), (n,))
    pred = MultivariateNormal(mean, DenseLinearOperator(cov_bad))
    floor = 0.05
    with gp.settings.max_cholesky_size(4096), gp.settings.cholesky_max_tries(2):
        nll_chol = float(negative_log_predictive_density(pred, y))
    assert not np.isfinite(nll_chol)  # jitter escalation cannot reach min-eig 0.5
    val = float(negative_log_predictive_density(pred, y, eig_floor=floor))
    assert np.isfinite(val)
    w_fix = jnp.maximum(jnp.linalg.eigh(0.5 * (cov_bad + cov_bad.T))[0], floor)
    V_fix = jnp.linalg.eigh(0.5 * (cov_bad + cov_bad.T))[1]
    proj = V_fix.T @ y
    lp = -0.5 * (float(jnp.sum(proj**2 / w_fix)) + float(jnp.sum(jnp.log(w_fix)))
                 + n * np.log(2 * np.pi))
    np.testing.assert_allclose(val, -lp / n, rtol=1e-5)


# ----------------------------------------------------------------------------- settings
def test_settings_context_semantics():
    assert gp.settings.max_cg_iterations.value() == 1000
    with gp.settings.max_cg_iterations(17):
        assert gp.settings.max_cg_iterations.value() == 17
        with gp.settings.max_cg_iterations(4):
            assert gp.settings.max_cg_iterations.value() == 4
        assert gp.settings.max_cg_iterations.value() == 17
    assert gp.settings.max_cg_iterations.value() == 1000
    assert not gp.settings.fast_pred_var.on()
    with gp.settings.fast_pred_var(True):
        assert gp.settings.fast_pred_var.on()
    assert not gp.settings.fast_pred_var.on()


def test_settings_snapshot_hashable():
    with gp.settings.max_cg_iterations(42), gp.settings.deterministic_probes(True):
        snap = gp.settings.snapshot()
    assert snap.max_cg_iterations == 42 and snap.deterministic_probes
    assert hash(snap) == hash(snap)


# ----------------------------------------------------------------- state dict round trip
class _GP(ExactGP):
    def __init__(self, x, y, lik, kernel=None):
        super().__init__(x, y, lik)
        self.mean_module = ConstantMean()
        self.covar_module = kernel if kernel is not None else ScaleKernel(RBFKernel())

    def forward(self, x):
        return MultivariateNormal(self.mean_module(x), self.covar_module(x))


def test_state_dict_roundtrip_exact_gp():
    x = jnp.linspace(0, 1, 20)
    y = jnp.sin(x)
    m1 = _GP(x, y, GaussianLikelihood())
    m1.covar_module.base_kernel.lengthscale = 0.123
    m1.likelihood.noise = 0.456
    sd = m1.state_dict()
    m2 = _GP(x, y, GaussianLikelihood())
    m2.load_state_dict(sd)
    assert float(m2.covar_module.base_kernel.lengthscale.reshape(-1)[0]) == pytest.approx(0.123, rel=1e-5)
    assert float(jnp.reshape(m2.likelihood.noise, (-1,))[0]) == pytest.approx(0.456, rel=1e-5)
    with pytest.raises(Exception):
        m2.load_state_dict({"not.a.param": np.ones(3)}, strict=True)


# ------------------------------------------------------------------- multitask end-to-end
def test_multitask_gp_regression_e2e():
    n = 64
    x = jnp.linspace(0, 1, n)
    y = jnp.stack([jnp.sin(2 * jnp.pi * x), jnp.cos(2 * jnp.pi * x)], axis=-1)
    y = y + 0.03 * jax.random.normal(jax.random.PRNGKey(0), y.shape)

    class MTGP(ExactGP):
        def __init__(self, tx, ty, lik):
            super().__init__(tx, ty, lik)
            self.mean_module = MultitaskMean(ConstantMean(), num_tasks=2)
            self.covar_module = MultitaskKernel(RBFKernel(), num_tasks=2, rank=1)

        def forward(self, xx):
            return MultitaskMultivariateNormal(self.mean_module(xx), self.covar_module(xx))

    lik = MultitaskGaussianLikelihood(num_tasks=2)
    model = MTGP(x, y, lik)
    params = model.trainable_params()
    opt = optax.adam(0.1)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        def loss_fn(p):
            m = model.with_params(p)
            return -ExactMarginalLogLikelihood(m.likelihood, m)(m(x), y)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        u, s = opt.update(grads, s)
        return optax.apply_updates(p, u), s, loss

    for _ in range(75):
        params, state, loss = step(params, state)
    model = model.with_params(params).eval()
    test_x = jnp.linspace(0.02, 0.98, 21)
    pred = model.likelihood(model(test_x))
    truth = jnp.stack([jnp.sin(2 * jnp.pi * test_x), jnp.cos(2 * jnp.pi * test_x)], axis=-1)
    mae = float(jnp.mean(jnp.abs(pred.mean - truth)))
    assert mae < 0.1, f"multitask MAE {mae}"


# ------------------------------------------------------------ spectral mixture regression
def test_spectral_mixture_regression_e2e():
    """Mirror of reference test/examples/test_spectral_mixture_gp_regression.py: 15 train
    points of sin(2πx), 4 mixtures, Adam lr 0.01 × 300 iters, extrapolation MAE gate."""
    x = jnp.linspace(0, 1, 15)
    y = jnp.sin(x * (2 * jnp.pi))
    kernel = SpectralMixtureKernel(num_mixtures=4, ard_num_dims=1)
    kernel.initialize_from_data(x[:, None], y)
    model = _GP(x, y, GaussianLikelihood(), kernel=kernel)
    params = model.trainable_params()
    opt = optax.adam(0.01)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        def loss_fn(p):
            m = model.with_params(p)
            return -ExactMarginalLogLikelihood(m.likelihood, m)(m(x), y)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        u, s = opt.update(grads, s)
        return optax.apply_updates(p, u), s, loss

    for _ in range(300):
        params, state, loss = step(params, state)
    model = model.with_params(params).eval()
    test_x = jnp.linspace(0, 1.5, 31)  # extrapolation past the train range
    pred = model.likelihood(model(test_x))
    mae = float(jnp.mean(jnp.abs(pred.mean - jnp.sin(test_x * 2 * jnp.pi))))
    # reference gate is 0.02; allow slack for optimizer/init differences
    assert mae < 0.1, f"spectral mixture MAE {mae}"


def test_linalg_dtypes_contexts():
    """linalg_dtypes / _linalg_dtype_{cholesky,symeig} (reference: linear_operator
    settings, re-exported at gpytorch/settings.py:7-15): dense factorizations promote to
    the requested dtype (default double) where the runtime supports it."""
    import jax.numpy as jnp

    from gpytorch_tpu.solvers.cholesky import psd_safe_cholesky

    assert jnp.dtype(gp.settings._linalg_dtype_cholesky.value()) == jnp.dtype("float64")
    assert jnp.dtype(gp.settings._linalg_dtype_symeig.value()) == jnp.dtype("float64")
    with gp.settings.linalg_dtypes(default=jnp.float32):
        assert jnp.dtype(gp.settings._linalg_dtype_cholesky.value()) == jnp.dtype("float32")
        assert jnp.dtype(gp.settings._linalg_dtype_symeig.value()) == jnp.dtype("float32")
    assert jnp.dtype(gp.settings._linalg_dtype_cholesky.value()) == jnp.dtype("float64")

    # an f32 input factors through f64 under the default promotion and returns f32
    key = jax.random.PRNGKey(0)
    m = jax.random.normal(key, (12, 12), dtype=jnp.float32)
    A = m @ m.T + 1e-1 * jnp.eye(12, dtype=jnp.float32)
    L = psd_safe_cholesky(A)
    assert L.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(L @ L.T), np.asarray(A), atol=2e-4)
    # promotion disabled: still a valid f32 factorization
    with gp.settings.linalg_dtypes(default=jnp.float32):
        L32 = psd_safe_cholesky(A)
    assert L32.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(L32 @ L32.T), np.asarray(A), atol=2e-3)


def test_linear_cg_warm_start():
    # x0 warm start: exact-solution start exits at/below the cold iteration count with the
    # same accuracy, and tridiag extraction rejects a warm start (Krylov space must start
    # at the rhs for valid SLQ T matrices).
    import pytest as _pytest

    from gpytorch_tpu.solvers.cg import linear_cg

    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (60, 60))
    A = A @ A.T + 60 * jnp.eye(60)
    b = jax.random.normal(jax.random.PRNGKey(1), (60, 3))
    xs = jnp.linalg.solve(A, b)
    cold = linear_cg(lambda v: A @ v, b, tolerance=1e-4, max_iter=100)
    warm = linear_cg(lambda v: A @ v, b, tolerance=1e-4, max_iter=100, x0=xs)
    assert int(warm.num_iters) <= int(cold.num_iters)
    assert int(warm.num_iters) <= 2
    assert jnp.max(jnp.abs(warm.solution - xs)) < 1e-3
    assert jnp.max(jnp.abs(cold.solution - xs)) < 1e-3
    with _pytest.raises(ValueError):
        linear_cg(lambda v: A @ v, b, n_tridiag_iter=3, x0=xs)


def test_linear_cg_unroll_parity():
    """settings.cg_unroll unrolls the mandatory floor iterations as straight-line code;
    results match the pure while-loop to fusion-level rounding (the unrolled iterations
    run the same math, but XLA fuses straight-line code differently, so bit-identity is
    not guaranteed)."""
    from gpytorch_tpu.solvers.cg import linear_cg

    key = jax.random.PRNGKey(3)
    A = jax.random.normal(key, (80, 80))
    A = A @ A.T + 80 * jnp.eye(80)
    b = jax.random.normal(jax.random.PRNGKey(4), (80, 6))

    def run():
        return linear_cg(lambda v: A @ v, b, tolerance=1e-6, max_iter=60, n_tridiag_iter=8)

    base = run()
    for n_unroll in (4, 8, 16):
        with gp.settings.cg_unroll(n_unroll):
            u = run()
        assert abs(int(u.num_iters) - int(base.num_iters)) <= 1
        np.testing.assert_allclose(np.asarray(u.solution), np.asarray(base.solution), atol=1e-5)
        np.testing.assert_allclose(np.asarray(u.alphas), np.asarray(base.alphas), rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(u.betas), np.asarray(base.betas), rtol=1e-4, atol=1e-6)
    # rhs-warm shape: gated rhs column + truncated probe columns, under jit
    probes = jax.random.normal(jax.random.PRNGKey(5), (80, 4))
    rhs_all = jnp.concatenate([b[:, :1], probes], axis=-1)

    @jax.jit
    def run_warm(unroll_flag):
        del unroll_flag
        return linear_cg(
            lambda v: A @ v, rhs_all, tolerance=1e-6, max_iter=60, n_tridiag_iter=8,
            x0=jnp.zeros_like(rhs_all), conv_cols=1,
        )

    base_w = linear_cg(
        lambda v: A @ v, rhs_all, tolerance=1e-6, max_iter=60, n_tridiag_iter=8,
        x0=jnp.zeros_like(rhs_all), conv_cols=1,
    )
    with gp.settings.cg_unroll(8):
        u_w = run_warm(0)
    np.testing.assert_allclose(np.asarray(u_w.solution), np.asarray(base_w.solution), atol=1e-5)
    np.testing.assert_allclose(np.asarray(u_w.alphas), np.asarray(base_w.alphas), rtol=1e-4, atol=1e-6)


def test_linear_cg_truncated_solve_column_semantics():
    """Convergence-gated columns never return an iterate worse than their start (the
    2-norm best tracking is seeded with the initial residual, so a warm rhs column
    survives CG's early 2-norm overshoot); truncated non-gating columns (rhs-warm
    probe columns) return the FINAL Krylov iterate — the A-norm-optimal one — not an
    argmin-2-norm early iterate or x0=0 (the latter guts the SLQ probe trace term;
    measured on-chip as a training-basin collapse)."""
    from gpytorch_tpu.solvers.cg import linear_cg

    key = jax.random.PRNGKey(0)
    # ill-conditioned SPD: RBF-like Gram + small jitter (2-norm residual overshoots)
    x = jax.random.normal(key, (400, 3))
    d2 = jnp.sum((x[:, None, :] - x[None, :, :]) ** 2, -1)
    A = jnp.exp(-0.5 * d2) + 0.02 * jnp.eye(400)
    b = jax.random.normal(jax.random.PRNGKey(1), (400, 4))
    b_norm = jnp.linalg.norm(b, axis=0)

    # plain truncation (no conv_cols): returned residual <= ||b|| per column
    res = linear_cg(lambda v: A @ v, b, tolerance=1e-8, max_iter=5)
    r_trunc = jnp.linalg.norm(b - A @ res.solution, axis=0)
    assert bool(jnp.all(r_trunc <= b_norm * (1.0 + 1e-6))), (r_trunc / b_norm)

    # warm start at the exact solution with a loose gate: x0 survives any overshoot
    xs = jnp.linalg.solve(A, b[:, :1])
    x0 = jnp.concatenate([xs, jnp.zeros_like(b[:, 1:])], -1)
    res_w = linear_cg(lambda v: A @ v, b, tolerance=1.0, max_iter=6,
                      n_tridiag_iter=6, x0=x0, conv_cols=1)
    r_rhs = jnp.linalg.norm(b[:, :1] - A @ res_w.solution[:, :1]) / b_norm[0]
    assert float(r_rhs) < 1e-4, float(r_rhs)
    # probe columns carry the final Krylov iterate: decisively non-zero, and its A-norm
    # error beats both x=0 and every earlier iterate (A-norm monotonicity)
    probe_sol = res_w.solution[:, 1:]
    assert float(jnp.min(jnp.linalg.norm(probe_sol, axis=0))) > 1e-3
    x_star = jnp.linalg.solve(A, b[:, 1:])
    e = x_star - probe_sol
    anorm_final = jnp.sum(e * (A @ e), axis=0)
    anorm_zero = jnp.sum(x_star * (A @ x_star), axis=0)
    assert bool(jnp.all(anorm_final < anorm_zero)), (anorm_final, anorm_zero)
