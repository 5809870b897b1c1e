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
    from .. import settings

    settings._count_call("lanczos_tridiag")
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


def block_lanczos_ritz(
    matmul_fn,
    init_block: jax.Array,
    num_blocks: int,
    max_cols: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Block-Krylov Rayleigh–Ritz factorization: Q (..., n, m·b) orthonormal spanning
    the block Krylov space ``span{Ω, AΩ, …, A^{m-1}Ω}``, and T = Qᵀ A Q (..., mb, mb).

    TPU-first replacement for scalar Lanczos in the LOVE caches: the fused kernel
    matvec's cost is flat in the number of right-hand columns (up to ~128), so m block
    matvecs of width b span the same-size subspace as m·b sequential single-column
    Lanczos steps at ~1/b the wall-clock.  Forming T explicitly as Qᵀ(AQ) (Rayleigh–
    Ritz; Musco & Musco 2015) instead of trusting the three-term recurrence is also the
    f32-stable choice.  Each A·block is stored, so T costs one extra (mb × mb) matmul.
    """
    n = init_block.shape[-2]
    b = init_block.shape[-1]
    # more total columns than n would force the trailing qr to emit directions that are
    # NOT orthogonal to earlier blocks (qr of a numerically-zero residual block) — cap
    # the basis at n columns by narrowing the final block
    limit = n if max_cols is None else min(max_cols, n)
    Q, _ = jnp.linalg.qr(init_block[..., : min(b, limit)])  # (..., n, b)
    Qs = [Q]
    AQs = []
    cols = Q.shape[-1]
    for j in range(num_blocks):
        V = matmul_fn(Q)
        AQs.append(V)
        if j < num_blocks - 1 and cols < limit:
            # full re-orthogonalization (twice) against every previous block: f32 on
            # TPU loses orthogonality fast enough that the classic local recurrence
            # is not usable
            width = min(b, limit - cols)
            V = V[..., :width]
            for _ in range(2):
                for Qi in Qs:
                    V = V - Qi @ (jnp.swapaxes(Qi, -1, -2) @ V)
            Q, _ = jnp.linalg.qr(V)
            Qs.append(Q)
            cols += width
        elif j < num_blocks - 1:
            break
    Qf = jnp.concatenate(Qs, axis=-1)  # (..., n, mb)
    AQf = jnp.concatenate(AQs, axis=-1)
    T = jnp.swapaxes(Qf, -1, -2) @ AQf
    T = 0.5 * (T + jnp.swapaxes(T, -1, -2))
    return Qf, T


def _block_init(linop, initial_vectors, block_size: int):
    batch = linop.batch_shape
    n = linop.shape[-1]
    key = jax.random.PRNGKey(0)
    omega = jax.random.normal(key, batch + (n, block_size), dtype=linop.dtype)
    if initial_vectors is not None:
        vecs = initial_vectors if initial_vectors.ndim >= len(batch) + 2 else initial_vectors[..., None]
        vecs = vecs.astype(linop.dtype)
        k = min(block_size, vecs.shape[-1])
        omega = jnp.concatenate([vecs[..., :k], omega[..., k:]], axis=-1)
    return omega


def _block_plan(max_rank: int, n: int) -> Tuple[int, int]:
    """(block_size, num_blocks): keep Krylov degree ≥ 5 for spectral accuracy, width
    ≤ 32 so each block matvec stays in the fused kernel's flat-cost column regime."""
    b = max(1, min(32, -(-max_rank // 5), n))
    m = -(-max_rank // b)
    return b, m


def _ritz_root(linop, max_rank: int, initial_vectors, eig_floor: float, inverse: bool) -> jax.Array:
    from .. import settings

    settings._count_call("lanczos_root")
    n = linop.shape[-1]
    b, m = _block_plan(max_rank, n)
    init = _block_init(linop, initial_vectors, b)
    Q, T = block_lanczos_ritz(lambda v: linop._matmul(v), init, m)
    lam, V = jnp.linalg.eigh(T)  # ascending
    lam = jnp.maximum(lam[..., -max_rank:], eig_floor)
    # Floor the Ritz values at the operator's declared spectral lower bound (σ² for
    # K + σ²I).  At N=100k, ‖K̂‖ ~ 1e4-1e5 makes the f32 Rayleigh-Ritz noise in T
    # (~matvec_err · λ_max) larger than λ_min = σ² ~ 1e-2: the smallest Ritz values come
    # out tiny or negative, and the eig_floor alone turns them into 1/√(1e-8) ≈ 1e4
    # spikes in the INVERSE root — LOVE predictive variances go negative and the
    # min_variance clamp explodes the marginal NLPD (measured on-chip: 5020 vs −0.2 at
    # near-identical hypers).  Cauchy interlacing guarantees λ(QᵀAQ) ≥ λ_min(A) in exact
    # arithmetic, so the clamp is bit-neutral on healthy spectra.
    bound = linop._eig_lower_bound()
    if bound is not None:
        lam = jnp.maximum(lam, jax.lax.stop_gradient(jnp.asarray(bound, lam.dtype))[..., None])
    V = V[..., -max_rank:]
    scale = 1.0 / jnp.sqrt(lam) if inverse else jnp.sqrt(lam)
    return Q @ (V * scale[..., None, :])


def lanczos_root(linop, max_rank: int, initial_vectors=None, eig_floor: float = 1e-8) -> jax.Array:
    """K ≈ R Rᵀ with R of rank ``max_rank`` (LOVE forward cache), via block-Krylov
    Rayleigh–Ritz (see :func:`block_lanczos_ritz`)."""
    return _ritz_root(linop, max_rank, initial_vectors, eig_floor, inverse=False)


def lanczos_inv_root(linop, max_rank: int, initial_vectors=None, eig_floor: float = 1e-8) -> jax.Array:
    """K⁻¹ ≈ R Rᵀ (LOVE predictive-variance cache, reference:
    exact_prediction_strategies.py:269-272), via block-Krylov Rayleigh–Ritz."""
    return _ritz_root(linop, max_rank, initial_vectors, eig_floor, inverse=True)
