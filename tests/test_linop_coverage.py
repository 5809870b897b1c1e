"""Operator coverage flagged untested in round 1: Toeplitz FFT matvec, Cat, BatchRepeat,
Block{Diag,Interleaved}, LOVE fast predictive sampling, heteroskedastic noise
(reference: linear_operator unit tests; examples/..._LOVE_Fast_Variances_and_Sampling)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gpytorch_tpu as gp
from gpytorch_tpu.distributions import MultivariateNormal
from gpytorch_tpu.kernels import RBFKernel, ScaleKernel
from gpytorch_tpu.likelihoods import GaussianLikelihood
from gpytorch_tpu.linop import (
    BatchRepeatLinearOperator,
    BlockDiagLinearOperator,
    BlockInterleavedLinearOperator,
    CatLinearOperator,
    DenseLinearOperator,
    ToeplitzLinearOperator,
)
from gpytorch_tpu.means import ConstantMean
from gpytorch_tpu.models import ExactGP


def _rand(shape, k=0):
    return jax.random.normal(jax.random.PRNGKey(k), shape)


def test_toeplitz_matvec_matches_dense():
    n = 37
    col = jnp.exp(-0.3 * jnp.arange(n).astype(jnp.float64))
    op = ToeplitzLinearOperator(col)
    dense = np.empty((n, n))
    c = np.asarray(col)
    for i in range(n):
        for j in range(n):
            dense[i, j] = c[abs(i - j)]
    v = _rand((n, 3))
    np.testing.assert_allclose(np.asarray(op._matmul(v)), dense @ np.asarray(v), atol=1e-10)
    np.testing.assert_allclose(np.asarray(op.to_dense()), dense, atol=1e-12)
    np.testing.assert_allclose(np.asarray(op._diagonal()), np.diag(dense), atol=1e-12)


def test_toeplitz_matvec_large_fft():
    """FFT matvec at a size where a dense build would be wasteful."""
    n = 4096
    col = jnp.exp(-0.01 * jnp.arange(n).astype(jnp.float64))
    op = ToeplitzLinearOperator(col)
    v = _rand((n, 2))
    out = op._matmul(v)
    # spot-check a few rows against the direct sum
    idx = np.asarray([0, 17, 2048, 4095])
    c = np.asarray(col)
    vn = np.asarray(v)
    for i in idx:
        row = c[np.abs(i - np.arange(n))]
        np.testing.assert_allclose(np.asarray(out[i]), row @ vn, rtol=1e-8)


def test_cat_linear_operator_rows_and_cols():
    A = _rand((4, 6), 1)
    B = _rand((3, 6), 2)
    cat_rows = CatLinearOperator([DenseLinearOperator(A), DenseLinearOperator(B)], dim=-2)
    assert cat_rows.shape == (7, 6)
    v = _rand((6, 2), 3)
    np.testing.assert_allclose(
        np.asarray(cat_rows._matmul(v)), np.concatenate([A @ v, B @ v], 0), atol=1e-12
    )
    C = _rand((4, 3), 4)
    cat_cols = CatLinearOperator([DenseLinearOperator(A), DenseLinearOperator(C)], dim=-1)
    assert cat_cols.shape == (4, 9)
    w = _rand((9, 2), 5)
    expected = np.concatenate([np.asarray(A), np.asarray(C)], 1) @ np.asarray(w)
    np.testing.assert_allclose(np.asarray(cat_cols._matmul(w)), expected, atol=1e-12)


def test_batch_repeat_operator():
    A = _rand((5, 5), 1)
    op = BatchRepeatLinearOperator(DenseLinearOperator(A), (3,))
    assert op.shape == (3, 5, 5)
    v = _rand((3, 5, 2), 2)
    out = op._matmul(v)
    for b in range(3):
        np.testing.assert_allclose(np.asarray(out[b]), np.asarray(A) @ np.asarray(v[b]), atol=1e-12)


def test_block_diag_and_interleaved():
    blocks = _rand((3, 4, 4), 1)
    blocks = blocks @ jnp.swapaxes(blocks, -1, -2)
    bd = BlockDiagLinearOperator(DenseLinearOperator(blocks))
    bi = BlockInterleavedLinearOperator(DenseLinearOperator(blocks))
    assert bd.shape == (12, 12) and bi.shape == (12, 12)
    dense_bd = np.zeros((12, 12))
    for b in range(3):
        dense_bd[b * 4 : (b + 1) * 4, b * 4 : (b + 1) * 4] = np.asarray(blocks[b])
    np.testing.assert_allclose(np.asarray(bd.to_dense()), dense_bd, atol=1e-12)
    # interleaved = permutation of block-diag: rows/cols i*3+b <-> b*4+i
    perm = np.argsort([i * 3 + b for b in range(3) for i in range(4)])
    dense_bi = dense_bd[np.ix_(perm, perm)]
    np.testing.assert_allclose(np.asarray(bi.to_dense()), dense_bi, atol=1e-12)
    v = _rand((12, 2), 2)
    np.testing.assert_allclose(np.asarray(bd._matmul(v)), dense_bd @ np.asarray(v), atol=1e-12)
    np.testing.assert_allclose(np.asarray(bi._matmul(v)), dense_bi @ np.asarray(v), atol=1e-12)
    np.testing.assert_allclose(np.asarray(bd._diagonal()), np.diag(dense_bd), atol=1e-12)


class _GP(ExactGP):
    def __init__(self, x, y, lik):
        super().__init__(x, y, lik)
        self.mean_module = ConstantMean()
        self.covar_module = ScaleKernel(RBFKernel())

    def forward(self, x):
        return MultivariateNormal(self.mean_module(x), self.covar_module(x))


def test_love_fast_pred_var_and_samples():
    """Reference: LOVE notebook gates — fast variances close to exact; fast posterior
    samples reproduce the posterior covariance (stored-output covar MAE 6.6e-4 scale)."""
    x = jnp.linspace(0, 1, 80)
    y = jnp.sin(2 * jnp.pi * x)
    lik = GaussianLikelihood()
    lik.noise = 0.01
    model = _GP(x, y, lik).eval()
    test_x = jnp.linspace(0.05, 0.95, 12)

    with gp.settings.fast_pred_var(False):
        exact = model(test_x)
        exact_var = np.asarray(exact.variance)
        exact_cov = np.asarray(exact.covariance_matrix)
    model2 = _GP(x, y, lik).eval()
    with gp.settings.fast_pred_var(True), gp.settings.max_root_decomposition_size(60), \
         gp.settings.fast_computations(covar_root_decomposition=True):
        love = model2(test_x)
        love_var = np.asarray(love.variance)
    np.testing.assert_allclose(love_var, exact_var, atol=5e-3)

    with gp.settings.fast_pred_samples(True):
        samples = exact.rsample(jax.random.PRNGKey(0), (4000,))
    emp_cov = np.cov(np.asarray(samples).T)
    assert np.max(np.abs(emp_cov - exact_cov)) < 0.05 * max(np.max(np.abs(exact_cov)), 1e-2)


def test_heteroskedastic_noise_model():
    """Reference noise_models.py:109 — a second GP models log-noise."""
    from gpytorch_tpu.likelihoods import HeteroskedasticNoise, _GaussianLikelihoodBase

    x = jnp.linspace(0, 1, 40)
    noise_targets = jnp.log(0.01 + 0.1 * x)  # heteroskedastic: noise grows with x
    noise_lik = GaussianLikelihood()
    noise_gp = _GP(x, noise_targets, noise_lik).eval()
    het = HeteroskedasticNoise(noise_gp)
    noise_covar = het(x[:, None])
    diag = np.asarray(noise_covar._diagonal())
    assert diag.shape == (40,)
    assert np.all(diag > 0)
    # noise should increase with x (the noise GP fits log-noise)
    assert diag[-1] > diag[0]

    main_lik = _GaussianLikelihoodBase(het)
    y = jnp.sin(2 * jnp.pi * x)
    model = _GP(x, y, main_lik)
    out = model(x)
    marginal = main_lik.marginal(out, x[:, None])
    assert bool(jnp.all(jnp.isfinite(marginal.variance)))


def test_preconditioner_apply_matches_dense_and_logdet_grads():
    """Whitened-eigenspace Woodbury apply (linop/added_diag.py): P⁻¹v matches a dense
    solve of P = LLᵀ + D, log|P| matches slogdet, and the log|P| gradient (consumed by
    settings.precond_logdet_vr) is finite — regression net for the f32-stability rewrite."""
    from gpytorch_tpu.kernels import RBFKernel, ScaleKernel
    from gpytorch_tpu.solvers.pivoted_cholesky import pivoted_cholesky

    key = jax.random.PRNGKey(0)
    n, d, k = 300, 3, 25
    x = jax.random.uniform(key, (n, d))
    kern = ScaleKernel(RBFKernel(ard_num_dims=d))
    kern.outputscale = 0.072
    kern.base_kernel.lengthscale = jnp.asarray([0.374, 0.312, 0.435])
    noise = 0.0058  # ill-conditioned: cond(P) ~ lambda_max/noise
    with gp.settings.max_preconditioner_size(k), gp.settings.min_preconditioning_size(1):
        op = kern(x).evaluate_kernel().add_jitter(noise)
        apply_inv, P_op, logdet_p = op._preconditioner()
        L = pivoted_cholesky(kern(x).evaluate_kernel(), rank=k)
        P = L @ L.T + noise * jnp.eye(n)
        v = jax.random.normal(jax.random.PRNGKey(1), (n, 2))
        np.testing.assert_allclose(
            np.asarray(apply_inv(v)), np.asarray(jnp.linalg.solve(P, v)), atol=1e-6
        )
        np.testing.assert_allclose(float(logdet_p), float(jnp.linalg.slogdet(P)[1]), atol=1e-8)

        def f(p):
            oo = kern.with_params(p)(x).evaluate_kernel().add_jitter(noise)
            return oo._preconditioner()[2]

        g = jax.grad(f)(kern.trainable_params())
        assert all(bool(jnp.all(jnp.isfinite(l))) for l in jax.tree_util.tree_leaves(g))


def test_preconditioner_noise_budget_regularizes():
    """settings.preconditioner_noise_budget: P becomes LLᵀ + max(D, τ)I with
    τ = λ_max·eps/budget — cond(P) is bounded while apply/logdet stay self-consistent
    (the f32-TPU enabler for preconditioned eval; measured 37 vs 289 CG iters at N=100k)."""
    from gpytorch_tpu.kernels import RBFKernel, ScaleKernel

    key = jax.random.PRNGKey(0)
    n, d, k = 300, 3, 25
    # f32: τ = λ_max·eps/budget scales with the working precision's eps — in f64 it
    # correctly never engages (no regularization needed), so the test runs at f32
    x = jax.random.uniform(key, (n, d), dtype=jnp.float32)
    kern = ScaleKernel(RBFKernel(ard_num_dims=d, dtype=jnp.float32), dtype=jnp.float32)
    kern.outputscale = 2.0
    noise = 1e-5  # extreme conditioning so τ must engage
    budget = 1e-3
    with gp.settings.max_preconditioner_size(k), gp.settings.min_preconditioning_size(1), \
         gp.settings.preconditioner_noise_budget(budget):
        op = kern(x).evaluate_kernel().add_jitter(noise)
        apply_inv, P_op, logdet_p = op._preconditioner()
        P = P_op.to_dense()
        # τ engaged: the diagonal regularization exceeds the raw noise
        lam = jnp.linalg.eigvalsh(P)
        assert float(lam[0]) > 10 * noise
        # cond(P) ≤ budget / eps(dtype)
        assert float(lam[-1] / lam[0]) < budget / float(jnp.finfo(P.dtype).eps) * 1.01
        # apply and logdet are consistent with the SAME P_τ
        v = jax.random.normal(jax.random.PRNGKey(1), (n, 2), dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(apply_inv(v)),
            np.asarray(jnp.linalg.solve(P.astype(jnp.float64), v.astype(jnp.float64))),
            rtol=1e-2, atol=1e-2,
        )
        np.testing.assert_allclose(
            float(logdet_p), float(jnp.linalg.slogdet(P.astype(jnp.float64))[1]), atol=1e-2
        )


def test_pivoted_cholesky_near_singular_posterior_covariance_stays_finite():
    """Regression (VERDICT r1 #2): pivoted Cholesky of a numerically rank-deficient
    posterior covariance (K_tt − R Rᵀ with round-off-negative tail eigenvalues) must
    rank-truncate instead of emitting NaN/garbage columns — the TPU NLPD path hits
    exactly this operator (bench.py eval)."""
    import jax

    import jax.numpy as jnp
    import numpy as np

    from gpytorch_tpu.linop import DenseLinearOperator
    from gpytorch_tpu.solvers.pivoted_cholesky import pivoted_cholesky

    n = 64
    key = jax.random.PRNGKey(0)
    Q, _ = jnp.linalg.qr(jax.random.normal(key, (n, n), dtype=jnp.float64))
    # spectrum: a few real directions, then a round-off tail straddling zero
    lam = jnp.concatenate([
        jnp.asarray([3.0, 1.0, 0.3, 0.05]),
        1e-7 * jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (n - 4,))) - 5e-8,
    ]).astype(jnp.float64)
    A = (Q * lam) @ Q.T
    A = jnp.asarray(0.5 * (A + A.T), dtype=jnp.float32)
    L = pivoted_cholesky(DenseLinearOperator(A), rank=32)
    assert bool(jnp.all(jnp.isfinite(L))), "pivoted Cholesky emitted non-finite entries"
    # the factor reproduces the numerically-positive part of A
    resid = np.asarray(A - L @ L.T)
    assert np.max(np.abs(resid)) < 5e-4, np.max(np.abs(resid))
    # truncated columns are exactly zero (rank guard engaged, not noise)
    col_norms = np.linalg.norm(np.asarray(L), axis=0)
    assert np.min(col_norms) == 0.0


def test_pivoted_cholesky_healthy_matrix_unchanged_by_guard():
    """The rank-truncation guard must be a no-op on healthy spectra (basin-lottery rule:
    preconditioner numerics shifts re-roll training trajectories)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpytorch_tpu.linop import DenseLinearOperator
    from gpytorch_tpu.solvers.pivoted_cholesky import pivoted_cholesky

    n = 48
    x = jax.random.uniform(jax.random.PRNGKey(2), (n, 2), dtype=jnp.float32)
    A = jnp.exp(-0.5 * jnp.sum((x[:, None, :] - x[None, :, :]) ** 2, axis=-1)) + 0.1 * jnp.eye(n)
    L = pivoted_cholesky(DenseLinearOperator(A), rank=16)
    assert bool(jnp.all(jnp.isfinite(L)))
    col_norms = np.linalg.norm(np.asarray(L), axis=0)
    assert np.min(col_norms) > 0.0, "guard must not truncate a healthy factor"
    resid = np.asarray(A - L @ L.T)
    # rank-16 approximation error of a smooth RBF matrix is tiny
    assert np.max(np.abs(resid - np.diag(np.diag(resid)))) < 0.12


def test_fast_precond_grad_matches_scan_path():
    """settings.fast_precond_grad (default ON): the preconditioner root's VALUE is
    bit-identical to the legacy scan-differentiated path (stop-gradient straddle) and its
    GRADIENT — the fixed-pivot Nyström parameterization, solvers/pivoted_cholesky.py::
    nystrom_factor_from_pivots — agrees with differentiating the pivoted-Cholesky scan
    (both are d/dθ of K[:,p] K[p,p]⁻¹ K[p,:] at fixed pivots)."""
    key = jax.random.PRNGKey(0)
    n, d, k = 300, 3, 25
    x = jax.random.uniform(key, (n, d))
    kern = ScaleKernel(RBFKernel(ard_num_dims=d))
    kern.outputscale = 0.7
    kern.base_kernel.lengthscale = jnp.asarray([0.374, 0.312, 0.435])
    noise = 0.01
    params = kern.trainable_params()

    def logdet_p(p, fast):
        with gp.settings.max_preconditioner_size(k), gp.settings.min_preconditioning_size(1), \
                gp.settings.fast_precond_grad(fast):
            oo = kern.with_params(p)(x).evaluate_kernel().add_jitter(noise)
            return oo._preconditioner()[2]

    def apply_sum(p, fast):
        v = jax.random.normal(jax.random.PRNGKey(1), (n, 2))
        with gp.settings.max_preconditioner_size(k), gp.settings.min_preconditioning_size(1), \
                gp.settings.fast_precond_grad(fast):
            oo = kern.with_params(p)(x).evaluate_kernel().add_jitter(noise)
            _, P_op, _ = oo._preconditioner()
            return jnp.sum(v * P_op._matmul(v))

    for fn in (logdet_p, apply_sum):
        v_fast, g_fast = jax.value_and_grad(fn)(params, True)
        v_scan, g_scan = jax.value_and_grad(fn)(params, False)
        assert float(v_fast) == float(v_scan)  # straddle: values bit-identical
        for lf, ls in zip(jax.tree_util.tree_leaves(g_fast), jax.tree_util.tree_leaves(g_scan)):
            np.testing.assert_allclose(
                np.asarray(lf), np.asarray(ls),
                rtol=5e-4, atol=5e-4 * max(1.0, float(jnp.max(jnp.abs(ls)))),
            )
