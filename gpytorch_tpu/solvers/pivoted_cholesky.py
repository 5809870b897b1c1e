"""Pivoted (partial) Cholesky — the low-rank CG preconditioner.

Reference: linear_operator's ``pivoted_cholesky`` (functional façade at
gpytorch/__init__.py:146); used to build P = L Lᵀ + σ²I for mBCG (papers: arXiv 1602.06693,
arXiv 2107.00243).

Only needs the operator's diagonal and individual rows — never the full matrix.  Row access
goes through ``linop._get_rows`` (a kernel row evaluation for lazy kernel operators).  The
pivot selection (argmax of the residual diagonal) is data-dependent but shape-static, so the
whole routine is a ``lax.scan`` — reverse-mode differentiable (the pivot order is treated as
constant, matching piecewise differentiability).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pivoted_cholesky(
    linop, rank: int, jitter: float = 1e-8, rel_tol: float = 0.0, return_pivots: bool = False
) -> jax.Array:
    """Return L of shape (..., n, rank) with L Lᵀ ≈ linop (best rank-k pivoted approx).

    Inner-product precision follows ``settings.preconditioner_highest_precision``
    (default OFF → TPU one-pass bf16 dots).  HIGHEST matters only for the reverse-mode
    gradient of log|P| in the variance-reduced logdet estimator
    (settings.precond_logdet_vr), where the one-pass rounding bias scales with n — enable
    the two flags together.  It is deliberately NOT the default: the preconditioner is a
    preconditioner, 5e-3-level perturbations of L are harmless to CG and to the plain
    estimator, and changing L perturbs the probe stream z ∼ N(0, P), which measurably
    shifted N=100k bench training trajectories (bisected: RMSE 0.18 → 0.43)."""
    from .. import settings

    settings._count_call("pivoted_cholesky")
    # HIGHEST when explicitly requested OR when the solve path itself runs tight-tolerance
    # (kernel_matvec_highest): a one-pass-bf16 preconditioner apply injects ~4e-3-level
    # noise that acts as a CHANGING preconditioner, stagnating CG far above the eval
    # tolerance (measured on-chip: rank-50 "converged" at true residual 0.66 in bf16 vs
    # 9e-4 in HIGHEST, 26 iters).
    _prec = (
        jax.lax.Precision.HIGHEST
        if settings.preconditioner_highest_precision.on() or settings.kernel_matvec_highest.on()
        or settings.kernel_matvec_high.on() or settings.kernel_matvec_consistent_bf16.on()
        else None
    )
    diag = linop._diagonal()  # (..., n)
    batch = diag.shape[:-1]
    n = diag.shape[-1]
    rank = int(min(rank, n))
    dt = diag.dtype
    # Rank-truncation guard: once the residual diagonal reaches the round-off floor of the
    # ORIGINAL diagonal, the matrix is numerically exhausted — further columns are
    # noise/denom amplifications (and, for near-singular posterior covariances K_tt − RRᵀ
    # on TPU, a NaN factory: residual rows ~bf16 noise divided by √(~0) pivots).  Columns
    # past that point are exactly zero, which is the correct rank-truncated factor.
    # Healthy spectra never trip the guard (pivot ≫ floor), leaving bit-identical results.
    eps = float(jnp.finfo(dt).eps)
    stop_tol = jnp.maximum(jnp.asarray(jitter, dt), 10.0 * eps * jnp.max(diag, axis=-1))  # (...,)
    # rel_tol > 0 (the preconditioner-build path, settings.preconditioner_tolerance):
    # stop adding columns once the residual trace falls below rel_tol of the original —
    # matching linear_operator's preconditioner early exit.  The public pivoted_cholesky
    # keeps rel_tol=0 (full requested rank).
    orig_trace = jnp.maximum(jnp.sum(diag, axis=-1), 1e-30)  # (...,)

    def step(carry, _):
        d, L, m = carry  # d: (..., n) residual diagonal; L: (..., n, rank); m: iter index
        pivot = jnp.argmax(d, axis=-1)  # (...,)
        pivot_val = jnp.take_along_axis(d, pivot[..., None], axis=-1)[..., 0]  # (...,)
        row = linop._get_rows(pivot[..., None])[..., 0, :]  # (..., n)
        # subtract previously-selected columns: row_i - L @ L[pivot]
        L_pivot = jnp.take_along_axis(L, pivot[..., None, None], axis=-2)[..., 0, :]  # (..., rank)
        correction = jnp.einsum("...nk,...k->...n", L, L_pivot, precision=_prec)
        denom = jnp.sqrt(jnp.maximum(pivot_val, jitter))
        col = (row - correction) / denom[..., None]
        live = (pivot_val > stop_tol)[..., None]  # (..., 1)
        if rel_tol > 0.0:
            live = jnp.logical_and(live, (jnp.sum(d, axis=-1) > rel_tol * orig_trace)[..., None])
        col = jnp.where(live, col, jnp.zeros_like(col))
        col = jnp.where(jnp.isfinite(col), col, jnp.zeros_like(col))
        # force exact zero at the pivot-complement to keep d ≥ 0
        d_new = jnp.maximum(d - col * col, 0.0)
        d_new = jnp.where(jnp.arange(n) == pivot[..., None], jnp.zeros_like(d_new), d_new)
        L_new = jax.lax.dynamic_update_index_in_dim(
            jnp.moveaxis(L, -1, 0), col, m, axis=0
        )
        L_new = jnp.moveaxis(L_new, 0, -1)
        return (d_new, L_new, m + 1), pivot

    L0 = jnp.zeros(batch + (n, rank), dtype=dt)
    (d, L, _), pivots = jax.lax.scan(step, (diag, L0, jnp.asarray(0, jnp.int32)), None, length=rank)
    if return_pivots:
        return L, jnp.moveaxis(pivots, 0, -1)  # (..., rank)
    return L


def nystrom_factor_from_pivots(linop, pivots: jax.Array, jitter_rel: float = 1e-6) -> jax.Array:
    """Differentiable rank-k root from a FIXED pivot set: L = K[:, piv] · R⁻ᵀ with
    R = chol(K[piv, piv]), so L Lᵀ = K[:,piv] K[piv,piv]⁻¹ K[piv,:] — in exact arithmetic
    the same matrix the pivoted-Cholesky scan produces for that pivot order (partial
    Cholesky ≡ Nyström on the pivot set).

    Purpose: a cheap reverse-mode path for the variance-reduced logdet gradient
    (settings.precond_logdet_vr).  Differentiating the k-step `lax.scan` above costs a
    sequential backward sweep carrying (n, k) residuals (~50 ms/step at the N=100k
    flagship); this form is one k×k Cholesky + one (k, n) triangular solve — fully
    parallel, with only the k kernel rows feeding the kernel-parameter VJP.  Paired as
    ``value(scan) + grad(nystrom)`` via a ``custom_vjp`` (linop/added_diag.py::
    _pc_fast_grad) so forward values (probe streams, CG preconditioning) stay
    bit-identical and pure-inference callers never build the Nyström factor at all.
    """
    from .cholesky import psd_safe_cholesky

    k = pivots.shape[-1]
    rows = linop._get_rows(pivots)  # (..., k, n)
    # C[..., i, j] = rows[..., i, pivot_j]
    idx = jnp.broadcast_to(pivots[..., None, :], pivots.shape[:-1] + (k, k))
    C = jnp.take_along_axis(rows, idx, axis=-1)
    C = 0.5 * (C + jnp.swapaxes(C, -1, -2))
    # relative jitter: C inherits the kernel's scale; the greedy pivot order keeps the
    # leading minors well-conditioned, the jitter only guards truncated/repeated pivots
    tr = jnp.trace(C, axis1=-2, axis2=-1) / k
    eye = jnp.eye(k, dtype=C.dtype)
    R = psd_safe_cholesky(C + (jitter_rel * tr)[..., None, None] * eye, max_tries=3)
    Y = jax.scipy.linalg.solve_triangular(R, rows, lower=True)  # (..., k, n) = R⁻¹ K[piv, :]
    return jnp.swapaxes(Y, -1, -2)  # (..., n, k)
