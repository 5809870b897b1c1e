"""Kernel property tests (mirrors the reference shipped harness
gpytorch/test/base_kernel_test_case.py:13 — PSD-ness, diag consistency, batch broadcast,
active_dims) plus derivative-kernel checks against autodiff ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gpytorch_tpu as gp
from gpytorch_tpu import kernels as K
from gpytorch_tpu.linop import LinearOperator


def _make_kernels():
    return {
        "rbf": K.RBFKernel(),
        "rbf_ard": K.RBFKernel(ard_num_dims=3),
        "matern05": K.MaternKernel(nu=0.5),
        "matern15": K.MaternKernel(nu=1.5),
        "matern25": K.MaternKernel(nu=2.5),
        "rq": K.RQKernel(),
        "periodic": K.PeriodicKernel(),
        "cosine": K.CosineKernel(),
        "linear": K.LinearKernel(),
        "poly": K.PolynomialKernel(power=2),
        "scale_rbf": K.ScaleKernel(K.RBFKernel()),
        "constant": K.ConstantKernel(),
        "piecewise": K.PiecewisePolynomialKernel(q=2),
        "spectral_mixture": K.SpectralMixtureKernel(num_mixtures=3, ard_num_dims=3),
        "spectral_delta": K.SpectralDeltaKernel(num_dims=3, num_deltas=32),
        "rff": K.RFFKernel(num_samples=64),
        "additive": K.RBFKernel() + K.MaternKernel(nu=1.5),
        "product": K.RBFKernel() * K.MaternKernel(nu=1.5),
        "gibbs": K.GibbsKernel(),
        "arc": K.ArcKernel(K.MaternKernel(nu=2.5), ard_num_dims=3),
        "spherical_linear": K.SphericalLinearKernel(),
        "newton_girard": K.NewtonGirardAdditiveKernel(K.RBFKernel(ard_num_dims=3), num_dims=3, max_degree=2),
        "additive_structure": K.AdditiveStructureKernel(K.RBFKernel(), num_dims=3),
        "product_structure": K.ProductStructureKernel(K.RBFKernel(), num_dims=3),
        "gskl": K.GaussianSymmetrizedKLKernel(),
    }


@pytest.mark.parametrize("name", sorted(_make_kernels().keys()))
def test_kernel_psd_and_diag(name):
    kern = _make_kernels()[name]
    key = jax.random.PRNGKey(0)
    # cosine of the euclidean distance is PSD only in 1D (matches the reference kernel)
    d = 4 if name == "gskl" else (1 if name == "cosine" else 3)
    x = jax.random.normal(key, (7, d))
    with gp.settings.lazily_evaluate_kernels(False):
        Kmat = kern(x, x)
    Kd = Kmat.to_dense() if isinstance(Kmat, LinearOperator) else Kmat
    assert Kd.shape == (7, 7)
    # symmetry + PSD
    np.testing.assert_allclose(np.asarray(Kd), np.asarray(Kd).T, atol=1e-8)
    eigs = np.linalg.eigvalsh(np.asarray(Kd))
    assert eigs.min() > -1e-6, f"{name} not PSD: min eig {eigs.min()}"
    # diag consistency
    diag = kern(x, x, diag=True)
    np.testing.assert_allclose(np.asarray(diag), np.diag(np.asarray(Kd)), atol=1e-6, err_msg=name)


@pytest.mark.parametrize("name", ["rbf", "matern25", "rq", "periodic", "scale_rbf"])
def test_kernel_batch_broadcast(name):
    kern = _make_kernels()[name]
    key = jax.random.PRNGKey(1)
    x1 = jax.random.normal(key, (2, 5, 3))
    x2 = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 3))
    with gp.settings.lazily_evaluate_kernels(False):
        Kmat = kern(x1, x2)
    Kd = Kmat.to_dense() if isinstance(Kmat, LinearOperator) else Kmat
    assert Kd.shape == (2, 5, 4)
    # per-batch-element equality with unbatched evaluation
    with gp.settings.lazily_evaluate_kernels(False):
        K0 = kern(x1[0], x2[0])
    K0 = K0.to_dense() if isinstance(K0, LinearOperator) else K0
    np.testing.assert_allclose(np.asarray(Kd[0]), np.asarray(K0), atol=1e-8)


def test_kernel_batch_shape_params():
    kern = K.RBFKernel(batch_shape=(2,))
    kern.lengthscale = jnp.asarray([[[1.0]], [[2.0]]])
    x = jax.random.normal(jax.random.PRNGKey(0), (5, 1))
    with gp.settings.lazily_evaluate_kernels(False):
        Kd = kern(x, x).to_dense()
    assert Kd.shape == (2, 5, 5)
    assert not np.allclose(np.asarray(Kd[0]), np.asarray(Kd[1]))


def test_active_dims():
    kern = K.RBFKernel(active_dims=(0, 2))
    x = jax.random.normal(jax.random.PRNGKey(0), (6, 3))
    with gp.settings.lazily_evaluate_kernels(False):
        K_full = kern(x, x).to_dense()
        K_sub = K.RBFKernel()(x[:, [0, 2]], x[:, [0, 2]]).to_dense()
    np.testing.assert_allclose(np.asarray(K_full), np.asarray(K_sub), atol=1e-8)


def test_index_kernel():
    kern = K.IndexKernel(num_tasks=3, rank=2)
    i = jnp.asarray([[0], [1], [2], [1]])
    with gp.settings.lazily_evaluate_kernels(False):
        Kd = kern(i, i).to_dense()
    B = np.asarray(kern._eval_covar_matrix())
    expected = B[np.asarray(i)[:, 0]][:, np.asarray(i)[:, 0]]
    np.testing.assert_allclose(np.asarray(Kd), expected, atol=1e-8)


def test_multitask_kernel_interleaved_structure():
    kern = K.MultitaskKernel(K.RBFKernel(), num_tasks=2, rank=1)
    x = jnp.linspace(0, 1, 4)[:, None]
    with gp.settings.lazily_evaluate_kernels(False):
        Kd = np.asarray(kern(x, x).to_dense())
    assert Kd.shape == (8, 8)
    with gp.settings.lazily_evaluate_kernels(False):
        Kx = np.asarray(kern.data_covar_module(x, x).to_dense())
    Kt = np.asarray(kern.task_covar_module._eval_covar_matrix())
    expected = np.kron(Kx, Kt)
    np.testing.assert_allclose(Kd, expected, atol=1e-6)


def _finite_diff_check(kern_grad, base_kern, d):
    """Check derivative blocks against autodiff of the scalar kernel."""
    key = jax.random.PRNGKey(3)
    x1 = jax.random.normal(key, (3, d)).astype(jnp.float64)
    x2 = jax.random.normal(jax.random.PRNGKey(4), (2, d)).astype(jnp.float64)
    with gp.settings.lazily_evaluate_kernels(False):
        full = np.asarray(kern_grad(x1, x2).to_dense())

    def scalar_k(a, b):
        with gp.settings.lazily_evaluate_kernels(False):
            return base_kern(a[None], b[None]).to_dense()[0, 0]

    A = d + 1
    for i in range(3):
        for j in range(2):
            a, b = x1[i], x2[j]
            k_val = scalar_k(a, b)
            gx = jax.grad(scalar_k, argnums=0)(a, b)
            gy = jax.grad(scalar_k, argnums=1)(a, b)
            H = jax.jacfwd(jax.grad(scalar_k, argnums=0), argnums=1)(a, b)
            blk = full[i * A : (i + 1) * A, j * A : (j + 1) * A]
            np.testing.assert_allclose(blk[0, 0], float(k_val), atol=1e-6)
            np.testing.assert_allclose(blk[1:, 0], np.asarray(gx), atol=1e-6)
            np.testing.assert_allclose(blk[0, 1:], np.asarray(gy), atol=1e-6)
            np.testing.assert_allclose(blk[1:, 1:], np.asarray(H), atol=1e-5)


def test_rbf_kernel_grad_blocks():
    kern = K.RBFKernelGrad(dtype=jnp.float64)
    kern.lengthscale = 0.7
    base = K.RBFKernel(dtype=jnp.float64)
    base.lengthscale = 0.7
    _finite_diff_check(kern, base, d=2)


def test_matern52_kernel_grad_blocks():
    kern = K.Matern52KernelGrad(dtype=jnp.float64)
    kern.lengthscale = 0.9
    base = K.MaternKernel(nu=2.5, dtype=jnp.float64)
    base.lengthscale = 0.9
    _finite_diff_check(kern, base, d=2)


def test_polynomial_kernel_grad_blocks():
    kern = K.PolynomialKernelGrad(power=2, dtype=jnp.float64)
    base = K.PolynomialKernel(power=2, dtype=jnp.float64)
    base.initialize(**{"raw_offset": kern.raw_offset})
    _finite_diff_check(kern, base, d=2)


def test_rbf_gradgrad_value_and_grad_blocks():
    d = 2
    kern = K.RBFKernelGradGrad(dtype=jnp.float64)
    kern.lengthscale = 0.8
    base = K.RBFKernel(dtype=jnp.float64)
    base.lengthscale = 0.8
    key = jax.random.PRNGKey(5)
    x1 = jax.random.normal(key, (2, d)).astype(jnp.float64)
    x2 = jax.random.normal(jax.random.PRNGKey(6), (2, d)).astype(jnp.float64)
    with gp.settings.lazily_evaluate_kernels(False):
        full = np.asarray(kern(x1, x2).to_dense())

    def scalar_k(a, b):
        with gp.settings.lazily_evaluate_kernels(False):
            return base(a[None], b[None]).to_dense()[0, 0]

    A = 2 * d + 1
    a, b = x1[0], x2[1]
    blk = full[0 * A : A, 1 * A : 2 * A]
    # value/grad blocks
    np.testing.assert_allclose(blk[0, 0], float(scalar_k(a, b)), atol=1e-8)
    gy = jax.grad(scalar_k, argnums=1)(a, b)
    np.testing.assert_allclose(blk[0, 1 : d + 1], np.asarray(gy), atol=1e-7)
    # second derivative wrt x'_b twice (diagonal of d²/db²)
    Hbb = jax.jacfwd(jax.grad(scalar_k, argnums=1), argnums=1)(a, b)
    np.testing.assert_allclose(blk[0, d + 1 :], np.diag(np.asarray(Hbb)), atol=1e-6)
    # fourth-order block: ∂²/∂a_i² ∂²/∂b_j²
    def d2a(a, b, i):
        return jax.jacfwd(jax.grad(scalar_k, argnums=0), argnums=0)(a, b)[i, i]

    for i in range(d):
        for j in range(d):
            val = jax.jacfwd(jax.jacfwd(lambda bb: d2a(a, bb, i)))(b)[j, j]
            np.testing.assert_allclose(blk[d + 1 + i, d + 1 + j], float(val), atol=1e-5)
    # third-order block: ∂/∂a_i ∂²/∂b_j²
    for j in range(d):
        g3 = jax.grad(lambda aa: jax.jacfwd(jax.jacfwd(lambda bb: scalar_k(aa, bb)))(b)[j, j])(a)
        np.testing.assert_allclose(blk[1 : d + 1, d + 1 + j], np.asarray(g3), atol=1e-6)
