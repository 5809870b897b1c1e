"""Lanczos tridiagonalization and partial root decompositions (LOVE).

Reference: linear_operator's lanczos utilities, reached through
``root_decomposition`` / ``root_inv_decomposition`` (gpytorch/__init__.py:176-219; LOVE paper
arXiv 1803.06058).  Implemented as a ``lax.scan`` with full re-orthogonalization (stable in
f32 — important on TPU where f64 is unavailable).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def lanczos_tridiag(
    matmul_fn,
    init_vec: jax.Array,
    num_iter: int,
    eps: float = 1e-10,
) -> Tuple[jax.Array, jax.Array]:
    """Run ``num_iter`` Lanczos steps from ``init_vec`` (..., n).

    Returns (Q, T): Q (..., n, k) orthonormal, T (..., k, k) tridiagonal with
    Qᵀ A Q ≈ T.  Full re-orthogonalization against all previous vectors each step.
    """
    nrm = jnp.linalg.norm(init_vec, axis=-1, keepdims=True)
    q0 = init_vec / jnp.maximum(nrm, eps)
    batch = q0.shape[:-1]
    n = q0.shape[-1]
    k = int(min(num_iter, n))
    dt = q0.dtype

    Q0 = jnp.zeros(batch + (k, n), dtype=dt)  # rows are Lanczos vectors
    Q0 = Q0.at[..., 0, :].set(q0)

    alphas0 = jnp.zeros(batch + (k,), dtype=dt)
    betas0 = jnp.zeros(batch + (k,), dtype=dt)

    def step2(carry, j):
        Q, alphas, betas, q_cur, q_prev, beta_prev = carry
        v = matmul_fn(q_cur[..., :, None])[..., 0]
        alpha = jnp.sum(q_cur * v, axis=-1)
        v = v - alpha[..., None] * q_cur - beta_prev[..., None] * q_prev
        for _ in range(2):
            coeffs = jnp.einsum("...kn,...n->...k", Q, v)
            v = v - jnp.einsum("...kn,...k->...n", Q, coeffs)
        beta = jnp.linalg.norm(v, axis=-1)
        q_next = v / jnp.maximum(beta, eps)[..., None]
        alphas = _set_index(alphas, alpha, j, axis=-1)
        betas = _set_index(betas, beta, j, axis=-1)
        Q = jnp.where((j + 1) < k, _set_index(Q, q_next, j + 1, axis=-2, clamp_max=k - 1), Q)
        return (Q, alphas, betas, q_next, q_cur, beta), None

    q_prev0 = jnp.zeros_like(q0)
    beta_prev0 = jnp.zeros(batch, dtype=dt)
    carry0 = (Q0, alphas0, betas0, q0, q_prev0, beta_prev0)
    (Q, alphas, betas, _, _, _), _ = jax.lax.scan(step2, carry0, jnp.arange(k))

    # T: diag = alphas, offdiag = betas[:-1]
    T = jnp.zeros(batch + (k, k), dtype=dt)
    idx = jnp.arange(k)
    T = T.at[..., idx, idx].set(alphas)
    if k > 1:
        i0 = jnp.arange(k - 1)
        off = betas[..., : k - 1]
        T = T.at[..., i0, i0 + 1].set(off)
        T = T.at[..., i0 + 1, i0].set(off)
    return jnp.swapaxes(Q, -1, -2), T  # Q as (..., n, k)


def _set_index(buf, value, j, axis, clamp_max: Optional[int] = None):
    j = jnp.asarray(j)
    if clamp_max is not None:
        j = jnp.minimum(j, clamp_max)
    moved = jnp.moveaxis(buf, axis, 0)
    moved = jax.lax.dynamic_update_index_in_dim(moved, value, j, axis=0)
    return jnp.moveaxis(moved, 0, axis)


def _default_init(linop, initial_vectors):
    batch = linop.batch_shape
    n = linop.shape[-1]
    if initial_vectors is not None:
        vec = initial_vectors if initial_vectors.ndim == len(batch) + 1 else initial_vectors[..., 0]
        return vec.astype(linop.dtype)
    key = jax.random.PRNGKey(0)
    return jax.random.normal(key, batch + (n,), dtype=linop.dtype)


def lanczos_root(linop, max_rank: int, initial_vectors=None, eig_floor: float = 1e-8) -> jax.Array:
    """K ≈ R Rᵀ with R = Q V Λ^{1/2} of rank ``max_rank`` (LOVE forward cache)."""
    init = _default_init(linop, initial_vectors)
    Q, T = lanczos_tridiag(lambda v: linop._matmul(v), init, max_rank)
    lam, V = jnp.linalg.eigh(T)
    lam = jnp.maximum(lam, eig_floor)
    return Q @ (V * jnp.sqrt(lam)[..., None, :])


def lanczos_inv_root(linop, max_rank: int, initial_vectors=None, eig_floor: float = 1e-8) -> jax.Array:
    """K⁻¹ ≈ R Rᵀ with R = Q V Λ^{-1/2} (LOVE predictive-variance cache,
    reference: exact_prediction_strategies.py:269-272)."""
    init = _default_init(linop, initial_vectors)
    Q, T = lanczos_tridiag(lambda v: linop._matmul(v), init, max_rank)
    lam, V = jnp.linalg.eigh(T)
    lam = jnp.maximum(lam, eig_floor)
    return Q @ (V / jnp.sqrt(lam)[..., None, :])
