"""CIQ / multi-shift CG solver accuracy (reference: linear_operator contour_integral_quad,
used by CiqVariationalStrategy at gpytorch/variational/ciq_variational_strategy.py:128)."""

import jax
import jax.numpy as jnp
import numpy as np

from gpytorch_tpu.kernels import RBFKernel
from gpytorch_tpu.linop import DenseLinearOperator
from gpytorch_tpu.solvers.contour import (
    _ellipj_real,
    _elliptic_nodes,
    shifted_cg,
    sqrt_inv_matmul,
)


def _test_matrix(n=25, jitter=1e-4):
    Z = jnp.linspace(0, 1, n)[:, None]
    return RBFKernel()(Z, Z).to_dense() + jitter * jnp.eye(n)


def test_ellipj_against_scipy():
    from scipy import special

    u = np.linspace(0.1, 2.0, 5)
    for m in [0.1, 0.5, 0.9]:
        s, c, d = _ellipj_real(jnp.asarray(u), jnp.asarray(m))
        sn, cn, dn, _ = special.ellipj(u, m)
        np.testing.assert_allclose(np.asarray(s), sn, atol=1e-12)
        np.testing.assert_allclose(np.asarray(c), cn, atol=1e-12)
        np.testing.assert_allclose(np.asarray(d), dn, atol=1e-12)


def test_elliptic_nodes_scalar_quadrature():
    shifts, weights = _elliptic_nodes(0.01, 10.0, 15)
    for lam in [0.01, 0.1, 1.0, 10.0]:
        approx = float(jnp.sum(weights / (lam + shifts)))
        np.testing.assert_allclose(approx, lam**-0.5, rtol=1e-10)


def test_shifted_cg_matches_direct_solves():
    K = _test_matrix()
    rhs = jax.random.normal(jax.random.PRNGKey(0), (25, 3))
    shifts = jnp.asarray([1e-3, 0.1, 1.0, 5.0])
    sol = shifted_cg(lambda v: K @ v, rhs, shifts, max_iter=100)
    for j in range(shifts.shape[0]):
        truth = jnp.linalg.solve(K + shifts[j] * jnp.eye(25), rhs)
        np.testing.assert_allclose(np.asarray(sol[j]), np.asarray(truth), atol=1e-6)


def test_sqrt_inv_matmul_accuracy_eager_and_jit():
    K = _test_matrix()
    rhs = jax.random.normal(jax.random.PRNGKey(0), (25, 3))
    lam, V = jnp.linalg.eigh(K)
    truth = (V * (1.0 / jnp.sqrt(lam))) @ V.T @ rhs
    scale = float(jnp.max(jnp.abs(truth)))

    # default minres_tolerance (1e-4, reference parity) → ~1e-4-accurate K^{-1/2}
    res_default = sqrt_inv_matmul(DenseLinearOperator(K), rhs)
    assert float(jnp.max(jnp.abs(res_default - truth))) / scale < 1e-3

    # a tight tolerance buys the extra digits (the knob is live)
    import gpytorch_tpu as gp

    with gp.settings.minres_tolerance(1e-10):
        res = sqrt_inv_matmul(DenseLinearOperator(K), rhs)
        assert float(jnp.max(jnp.abs(res - truth))) / scale < 1e-5

        jres = jax.jit(lambda K, r: sqrt_inv_matmul(DenseLinearOperator(K), r))(K, rhs)
        assert float(jnp.max(jnp.abs(jres - truth))) / scale < 1e-5


def test_sqrt_inv_matmul_gradients_finite():
    K = _test_matrix()
    rhs = jax.random.normal(jax.random.PRNGKey(0), (25, 2))
    g = jax.grad(lambda K: jnp.sum(sqrt_inv_matmul(DenseLinearOperator(K), rhs)))(K)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_solve_iterative_refinement_improves_ill_conditioned():
    """settings.solve_iterative_refinements — the TPU substitute for the reference's f64
    promotion (linalg_dtypes): each pass re-solves against the true residual."""
    import gpytorch_tpu as gp
    from gpytorch_tpu.solvers.cg import linear_solve_cg

    n = 300
    Z = jnp.linspace(0, 1, n)[:, None]
    K = RBFKernel()(Z, Z).to_dense() + 1e-6 * jnp.eye(n)  # ill-conditioned small-noise system
    rhs = jax.random.normal(jax.random.PRNGKey(0), (n, 1))
    truth = jnp.linalg.solve(K, rhs)

    with gp.settings.max_cg_iterations(60), gp.settings.cg_tolerance(1e-10), gp.settings.cg_stall_window(5):
        base = linear_solve_cg(DenseLinearOperator(K), rhs)
        with gp.settings.solve_iterative_refinements(2):
            refined = linear_solve_cg(DenseLinearOperator(K), rhs)
    err_base = float(jnp.linalg.norm(K @ base - rhs))
    err_ref = float(jnp.linalg.norm(K @ refined - rhs))
    assert err_ref <= err_base * 1.01, (err_base, err_ref)
    assert jnp.all(jnp.isfinite(refined))
