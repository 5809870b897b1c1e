"""The reference utils shim modules (reference: gpytorch/utils/{lanczos,cholesky,sparse,
toeplitz,broadcasting,getitem,permutation}.py forwarders) — correctness of the forwarded
implementations."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg as sla

from gpytorch_tpu.utils.broadcasting import _matmul_broadcast_shape, _mul_broadcast_shape
from gpytorch_tpu.utils.cholesky import psd_safe_cholesky
from gpytorch_tpu.utils.getitem import _noop_index
from gpytorch_tpu.utils.lanczos import lanczos_tridiag
from gpytorch_tpu.utils.permutation import apply_permutation, inverse_permutation
from gpytorch_tpu.utils.toeplitz import (
    sym_toeplitz_derivative_quadratic_form,
    sym_toeplitz_matmul,
    toeplitz_matmul,
)


def test_toeplitz_matmul_general():
    key = jax.random.PRNGKey(0)
    n, t = 7, 3
    c = jax.random.normal(key, (n,))
    r = jax.random.normal(jax.random.PRNGKey(1), (n,)).at[0].set(c[0])
    v = jax.random.normal(jax.random.PRNGKey(2), (n, t))
    T = sla.toeplitz(np.asarray(c), np.asarray(r))
    np.testing.assert_allclose(np.asarray(toeplitz_matmul(c, r, v)), T @ np.asarray(v), atol=1e-10)
    # symmetric fast path agrees
    np.testing.assert_allclose(
        np.asarray(sym_toeplitz_matmul(c, v)), sla.toeplitz(np.asarray(c)) @ np.asarray(v), atol=1e-10
    )


def test_sym_toeplitz_derivative_quadratic_form_matches_autodiff():
    key = jax.random.PRNGKey(3)
    n = 7
    c = jax.random.normal(key, (n,))
    l = jax.random.normal(jax.random.PRNGKey(4), (n, 2))
    rv = jax.random.normal(jax.random.PRNGKey(5), (n, 2))

    def f(col):
        T = col[jnp.abs(jnp.arange(n)[:, None] - jnp.arange(n)[None, :])]
        return jnp.sum(l * (T @ rv))

    np.testing.assert_allclose(
        np.asarray(sym_toeplitz_derivative_quadratic_form(l, rv)),
        np.asarray(jax.grad(f)(c)),
        atol=1e-10,
    )


def test_permutation_helpers():
    perm = jnp.asarray([2, 0, 3, 1])
    inv = inverse_permutation(perm)
    np.testing.assert_array_equal(np.asarray(inv)[np.asarray(perm)], np.arange(4))
    m = jnp.arange(16.0).reshape(4, 4)
    out = apply_permutation(m, perm, perm)
    np.testing.assert_allclose(np.asarray(out), np.asarray(m)[np.asarray(perm)][:, np.asarray(perm)])


def test_broadcasting_and_getitem_and_cholesky():
    assert _mul_broadcast_shape((3, 1, 5), (2, 5)) == (3, 2, 5)
    assert _matmul_broadcast_shape((7, 4, 5), (5, 6)) == (7, 4, 6)
    assert _noop_index == slice(None)
    key = jax.random.PRNGKey(0)
    mat = jax.random.normal(key, (9, 9))
    A = mat @ mat.T + 0.5 * jnp.eye(9)
    L = psd_safe_cholesky(A)
    np.testing.assert_allclose(np.asarray(L @ L.T), np.asarray(A), atol=1e-8)


def test_lanczos_tridiag_shim():
    key = jax.random.PRNGKey(1)
    mat = jax.random.normal(key, (16, 16))
    A = mat @ mat.T + jnp.eye(16)
    q, t = lanczos_tridiag(lambda v: A @ v, jax.random.normal(jax.random.PRNGKey(2), (16,)), num_iter=16)
    # full-rank tridiagonalization reproduces the spectrum
    ev_t = np.linalg.eigvalsh(np.asarray(t))
    ev_a = np.linalg.eigvalsh(np.asarray(A))
    np.testing.assert_allclose(ev_t.max(), ev_a.max(), rtol=1e-6)
