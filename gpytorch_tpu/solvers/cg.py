"""Batched preconditioned conjugate gradients with Lanczos tridiagonal extraction (mBCG).

This is the TPU-native replacement for linear_operator's ``linear_cg`` — the engine behind
BBMM inference (reference call site: MultivariateNormal.log_prob →
gpytorch/distributions/multivariate_normal.py:249 → linear_operator inv_quad_logdet; paper:
Gardner et al., arXiv 1809.11165).

Design for XLA:
  * one ``lax.while_loop`` with static-shape state; per-column convergence is a mask, the loop
    exits when all columns converge or ``max_iter`` is hit;
  * every iteration is one operator matvec (the hot op — a fused Pallas kernel for lazy kernel
    operators) plus VPU-bound axpys — exactly the arithmetic the hardware wants;
  * CG coefficients (α, β) for the first ``n_tridiag_iter`` iterations are written into fixed
    buffers with ``dynamic_update_index``, from which the Lanczos tridiagonal matrices T_j are
    assembled for stochastic Lanczos quadrature.

Gradients never flow through this loop — callers wrap it in ``jax.custom_vjp``
(see solvers/inv_quad.py, solvers/solve.py).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .. import settings


class CGResult(NamedTuple):
    solution: jax.Array          # (..., n, t)
    alphas: Optional[jax.Array]  # (n_tridiag_iter, ..., t) or None
    betas: Optional[jax.Array]   # (n_tridiag_iter, ..., t) or None
    num_iters: jax.Array         # scalar int
    residual_norm: jax.Array     # (..., t)


def linear_cg(
    matmul_fn: Callable[[jax.Array], jax.Array],
    rhs: jax.Array,
    precond_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
    max_iter: Optional[int] = None,
    tolerance: Optional[float] = None,
    n_tridiag_iter: int = 0,
    eps: float = 1e-10,
    axis_name: Optional[str] = None,
    global_n: Optional[int] = None,
    x0: Optional[jax.Array] = None,
    conv_cols: Optional[int] = None,
    lagged_rhs_init: bool = False,
) -> CGResult:
    """Solve A x = rhs for all columns of rhs simultaneously.

    ``axis_name``: when running under ``shard_map`` with rows sharded over a mesh axis, pass
    the axis name — all inner products and norms are then ``psum``-reduced so every device
    runs an identical CG trajectory on its row block (the distributed mBCG of SURVEY §2.2).

    ``x0``: optional warm-start iterate (same shape as ``rhs``, unnormalized).  Costs one
    extra matvec to form the true initial residual.  Do not combine with
    ``n_tridiag_iter > 0`` unless ``conv_cols`` is set — the Lanczos tridiagonals for SLQ
    are only valid for a zero initial guess (the Krylov space must start at the rhs).

    ``conv_cols``: when set, ONLY the first ``conv_cols`` columns gate convergence and
    stagnation — the loop stops once those columns converge/stall (but never before
    ``n_tridiag_iter``); the remaining columns receive whatever iterations the gating
    columns needed.  This is the rhs-only warm-start mode of mBCG training: the rhs column
    is warm-started and gates the stop, the probe columns are fresh (zero ``x0`` — the
    caller guarantees it, which keeps their tridiagonals valid) and are deliberately
    truncated; the variance-reduced logdet gradient (``settings.precond_logdet_vr``)
    confines the truncation error to a small residual term.
    """

    settings._count_call("linear_cg")

    def _reduce_sum(x, axis):
        s = jnp.sum(x, axis=axis)
        if axis_name is not None:
            s = jax.lax.psum(s, axis_name)
        return s

    def _col_norm(x):
        return jnp.sqrt(jnp.maximum(_reduce_sum(x * x, -2), 0.0))

    if max_iter is None:
        max_iter = settings.max_cg_iterations.value()
    if tolerance is None:
        tolerance = settings.cg_tolerance.value()
    n = rhs.shape[-2] if global_n is None else global_n
    max_iter = int(min(max_iter, 2 * n + 10))
    if settings.terminate_cg_by_size.on():
        # reference knob: CG is exact after n iterations in exact arithmetic — cap there
        max_iter = int(min(max_iter, n + 1))
    n_tridiag_iter = int(min(n_tridiag_iter, max_iter))
    if precond_fn is None:
        precond_fn = lambda v: v

    dt = rhs.dtype
    # normalize each column for scale-free tolerance (reference: linear_operator linear_cg)
    rhs_norm = _col_norm(rhs)[..., None, :]
    rhs_is_zero = rhs_norm < eps
    rhs_norm = jnp.where(rhs_is_zero, jnp.ones_like(rhs_norm), rhs_norm)
    b = rhs / rhs_norm

    # lagged warm-rhs initialization (settings.cg_lagged_rhs): fold r₀ = b − A x₀ into
    # the first loop iteration by starting the gated columns at x=0, r=b, p=x₀ and
    # forcing their first-iteration coefficients to α=1, β=0 — the iteration's own
    # algebra (x ← x + αp, r ← r − αAp) then performs the warm-start init inside the
    # same full-width matvec that runs the probe columns' first Krylov iteration.
    lagged = bool(lagged_rhs_init) and x0 is not None and conv_cols is not None
    if x0 is not None and not lagged:
        if n_tridiag_iter > 0 and conv_cols is None:
            raise ValueError(
                "linear_cg: x0 warm start is incompatible with tridiag extraction "
                "(pass conv_cols for the rhs-only warm mode, with zero x0 on the tridiag columns)"
            )
        x0 = x0 / rhs_norm
        r0 = b - matmul_fn(x0)
    elif lagged:
        x0_dir = x0 / rhs_norm  # becomes the gated columns' first search direction
        x0 = jnp.zeros_like(b)
        r0 = b
    else:
        x0 = jnp.zeros_like(b)
        r0 = b
    z0 = precond_fn(r0)
    if lagged:
        _gate_mask = jnp.arange(b.shape[-1]) < conv_cols
        p0 = jnp.where(_gate_mask, x0_dir, z0)
    else:
        p0 = z0
    rz0 = _reduce_sum(r0 * z0, -2)  # (..., t)

    batch_t = rz0.shape
    alphas0 = jnp.zeros((max(n_tridiag_iter, 1),) + batch_t, dtype=dt)
    betas0 = jnp.zeros((max(n_tridiag_iter, 1),) + batch_t, dtype=dt)
    converged0 = jnp.zeros(batch_t, dtype=bool)
    # Stagnation tracking: with finite-precision (one-pass bf16) matvecs the residual
    # bottoms out at the matvec noise floor and can then drift — keep the best iterate per
    # column and stop once no column has improved for `stall_window` iterations.  This is
    # what makes tolerance-based early exit actually fire on TPU.
    stall_window = int(settings.cg_stall_window.value())
    # Seed best-iterate tracking with the INITIAL iterate: a convergence-gated column must
    # never return an iterate worse than its starting point — in particular a warm-started
    # rhs column must not lose a good x0 to a first-iteration 2-norm overshoot (CG's 2-norm
    # residual can grow several-fold early; only the A-norm error is monotone).
    #
    # Truncated columns (the probe columns beyond ``conv_cols`` in rhs-warm mBCG, stopped
    # at the NTRI floor) deliberately do NOT use 2-norm best tracking: on the flagship
    # N=100k operator their 2-norm residual jumps ~4x at iteration 1 and stays flat for
    # tens of iterations while the A-norm error — the metric that bounds the SLQ
    # logdet-gradient bias — contracts monotonically, so the FINAL Krylov iterate is the
    # right one and argmin-2-norm would hand back an arbitrary early iterate (or x0=0,
    # which guts the probe trace term entirely — measured on-chip as a training-basin
    # collapse, RMSE 0.77).
    best_resid0 = _col_norm(r0)
    x_best0 = x0
    since_improve0 = jnp.zeros((), dtype=jnp.int32)

    def _gate(mask):
        # convergence/stagnation gating: all columns, or only the leading conv_cols ones
        return mask if conv_cols is None else mask[..., :conv_cols]

    def cond(state):
        k, x, r, z, p, rz, alphas, betas, conv, best_resid, x_best, since = state
        keep_going = jnp.logical_and(jnp.logical_not(jnp.all(_gate(conv))), since < stall_window)
        # always run at least n_tridiag_iter iterations so the T matrices are complete
        return jnp.logical_or(k < n_tridiag_iter, jnp.logical_and(k < max_iter, keep_going))

    def body(state):
        k, x, r, z, p, rz, alphas, betas, conv, best_resid, x_best, since = state
        Ap = matmul_fn(p)
        pAp = _reduce_sum(p * Ap, -2)  # (..., t)
        # Positivity guards must be RELATIVE: A and P are SPD, so pᵀAp > 0 and rᵀP⁻¹r > 0
        # in exact arithmetic — but finite-precision preconditioner applies (f32 Woodbury
        # at cond(P)~1e5 on TPU) break A-conjugacy, driving pAp toward 0/negative, which
        # explodes α, blows up x, and silently decouples the recurrence residual from
        # b − Ax (measured: "converged" solves with true residual ~1).  A column whose
        # curvature is below noise level freezes for this step and restarts from steepest
        # descent (β masked to 0 ⇒ p ← z) on the next.
        _rel = 10.0 * jnp.finfo(dt).eps
        pAp_floor = _rel * _col_norm(p) * _col_norm(Ap)
        krylov_dead = jnp.logical_or(pAp <= pAp_floor, rz <= 0.0)
        safe_pAp = jnp.where(krylov_dead, jnp.ones_like(pAp), pAp)
        alpha_raw = rz / safe_pAp
        alpha = jnp.where(jnp.logical_or(conv, krylov_dead), jnp.zeros_like(alpha_raw), alpha_raw)
        if lagged:
            # first iteration, gated columns: forced α=1 turns the ordinary update into
            # the warm-start init x ← x₀ (p was seeded with x₀), r ← b − A x₀
            _first_gated = jnp.logical_and(k == 0, jnp.arange(alpha.shape[-1]) < conv_cols)
            alpha = jnp.where(_first_gated, jnp.ones_like(alpha), alpha)

        x = x + alpha[..., None, :] * p
        r = r - alpha[..., None, :] * Ap
        resid = _col_norm(r)
        conv_new = jnp.logical_or(conv, resid < tolerance)

        improved = resid < best_resid
        x_best = jnp.where(improved[..., None, :], x, x_best)
        best_resid = jnp.minimum(best_resid, resid)
        since = jnp.where(jnp.any(_gate(improved)), jnp.zeros_like(since), since + 1)

        z = precond_fn(r)
        rz_new = _reduce_sum(r * z, -2)
        safe_rz = jnp.where(jnp.abs(rz) < eps, jnp.ones_like(rz), rz)
        beta_raw = rz_new / safe_rz
        beta = jnp.where(jnp.logical_or(conv_new, krylov_dead), jnp.zeros_like(beta_raw), beta_raw)
        if lagged:
            # gated columns restart from steepest descent after the forced init step
            beta = jnp.where(_first_gated, jnp.zeros_like(beta), beta)
        p = z + beta[..., None, :] * p

        if n_tridiag_iter > 0:
            # store raw (unmasked) α for live columns; dead columns get α=1, β=0 which
            # contributes a unit eigenvalue (log = 0) to T — harmless for SLQ.
            alpha_store = jnp.where(jnp.logical_or(conv, krylov_dead), jnp.ones_like(alpha_raw), alpha_raw)
            beta_store = beta
            store = jnp.logical_and(k < n_tridiag_iter, True)
            alphas = jax.lax.dynamic_update_index_in_dim(
                alphas, jnp.where(store, alpha_store, alphas[jnp.minimum(k, n_tridiag_iter - 1)]), jnp.minimum(k, n_tridiag_iter - 1), axis=0
            )
            betas = jax.lax.dynamic_update_index_in_dim(
                betas, jnp.where(store, beta_store, betas[jnp.minimum(k, n_tridiag_iter - 1)]), jnp.minimum(k, n_tridiag_iter - 1), axis=0
            )
        return (k + 1, x, r, z, p, rz_new, alphas, betas, conv_new, best_resid, x_best, since)

    state0 = (
        jnp.asarray(0, dtype=jnp.int32), x0, r0, z0, p0, rz0, alphas0, betas0, converged0,
        best_resid0, x_best0, since_improve0,
    )
    # Unroll the mandatory floor iterations (cond forces k < n_tridiag_iter to run no
    # matter what) as straight-line code: XLA fuses across them and skips the while-loop
    # bookkeeping.  The while_loop then handles any convergence-gated continuation — it
    # exits immediately when the floor was the whole solve (the rhs-warm flagship).
    n_unroll = int(min(n_tridiag_iter, settings.cg_unroll.value(), max_iter))
    state = state0
    for _ in range(n_unroll):
        state = body(state)
    k, x, r, z, p, rz, alphas, betas, conv, best_resid, x_best, _ = jax.lax.while_loop(cond, body, state)

    if conv_cols is not None:
        # gated columns: best 2-norm iterate; truncated columns: final (A-norm-optimal)
        col_gated = (jnp.arange(x.shape[-1]) < conv_cols)
        x_out = jnp.where(col_gated, x_best, x)
    else:
        x_out = x_best
    solution = x_out * rhs_norm
    solution = jnp.where(rhs_is_zero, jnp.zeros_like(solution), solution)
    if settings.verbose_linalg.on():
        # jit-compatible runtime observability: iteration count + residual summary per solve
        # (the reference's verbose_linalg logs every linalg call; SURVEY §5 asks for CG stats)
        def _log(num_iters, max_resid, mean_resid):
            settings.logger.info(
                "linear_cg: rhs %s, max_iter %d, tol %.2e -> %d iters, residual max %.3e mean %.3e",
                rhs.shape, max_iter, tolerance, int(num_iters), float(max_resid), float(mean_resid),
            )

        jax.debug.callback(_log, k, jnp.max(best_resid), jnp.mean(best_resid))
    if n_tridiag_iter > 0:
        return CGResult(solution, alphas[:n_tridiag_iter], betas[:n_tridiag_iter], k, best_resid)
    return CGResult(solution, None, None, k, best_resid)


def tridiag_from_coeffs(alphas: jax.Array, betas: jax.Array) -> jax.Array:
    """Assemble symmetric Lanczos tridiagonal matrices T from CG coefficients.

    alphas/betas: (m, ..., t) → T: (..., t, m, m) with
      T[0,0] = 1/α₀;  T[k,k] = 1/α_k + β_{k-1}/α_{k-1};  T[k-1,k] = √β_{k-1}/α_{k-1}.
    """
    m = alphas.shape[0]
    a = jnp.moveaxis(alphas, 0, -1)  # (..., t, m)
    bcoef = jnp.moveaxis(betas, 0, -1)
    inv_a = 1.0 / a
    diag = inv_a + jnp.concatenate([jnp.zeros_like(bcoef[..., :1]), bcoef[..., :-1] * inv_a[..., :-1]], axis=-1)
    off = jnp.sqrt(jnp.maximum(bcoef[..., :-1], 0.0)) * inv_a[..., :-1]
    T = jnp.zeros(a.shape[:-1] + (m, m), dtype=a.dtype)
    idx = jnp.arange(m)
    T = T.at[..., idx, idx].set(diag)
    if m > 1:
        idx0 = jnp.arange(m - 1)
        T = T.at[..., idx0, idx0 + 1].set(off)
        T = T.at[..., idx0 + 1, idx0].set(off)
    return T


def linear_solve_cg(linop, rhs: jax.Array, tolerance: Optional[float] = None) -> jax.Array:
    """Differentiable CG solve: custom VJP implementing dx = −A⁻¹ dA A⁻¹ rhs + A⁻¹ drhs.

    Reference behavior: linear_operator's autograd through CG; here the backward is a second
    CG solve plus a VJP through the operator's matmul (the BBMM trick).

    ``tolerance`` is a STATIC (trace-time) value: resolved to the ambient
    ``settings.cg_tolerance`` here, NOT inside the traced function — a traced tolerance
    operand would need a Python bool at trace time (jit-incompatible).
    """
    tol = float(tolerance) if tolerance is not None else float(settings.cg_tolerance.value())
    return _linear_solve_cg(tol, linop, rhs)


def _cg_solve_fwd_impl(tol, linop, rhs):
    precond_fn, _, _ = linop._preconditioner()
    result = linear_cg(lambda v: linop._matmul(v), rhs, precond_fn=precond_fn, tolerance=tol)
    x = result.solution
    # iterative refinement (TPU substitute for the reference's f64 promotion): re-solve
    # against the true residual to recover digits lost to the f32 Krylov recursion.
    # The residual matvec runs at HIGHEST regardless of the ambient matvec mode — under
    # kernel_matvec_consistent_bf16 the main CG converges on the PERTURBED operator
    # K̃ = bf16(K) (~2e-3 off K); only an accurate residual steers the refinement back
    # to the true-K solution (classic mixed-precision IR: cheap inner solve, exact outer
    # residual).  The correction solve stays in the cheap ambient mode.
    for _ in range(int(settings.solve_iterative_refinements.value())):
        with settings.kernel_matvec_bf16(False), settings.kernel_matvec_high(False), \
                settings.kernel_matvec_consistent_bf16(False), settings.kernel_matvec_highest(True):
            r = rhs - linop._matmul(x)
        corr = linear_cg(lambda v: linop._matmul(v), r, precond_fn=precond_fn, tolerance=tol)
        x = x + corr.solution
    return x


from functools import partial


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _linear_solve_cg(tol, linop, rhs):
    return _cg_solve_fwd_impl(tol, linop, rhs)


def _linear_solve_cg_fwd(tol, linop, rhs):
    sol = _cg_solve_fwd_impl(tol, linop, rhs)
    return sol, (linop, sol)


def _linear_solve_cg_bwd(tol, res, g):
    linop, sol = res
    # g: cotangent of solution x = A⁻¹ rhs
    # drhs-bar = A⁻¹ g ; dA-bar = −(A⁻¹ g) solᵀ  (delivered through vjp of linop.matmul)
    u = _cg_solve_fwd_impl(tol, jax.tree_util.tree_map(jax.lax.stop_gradient, linop), g)

    def quad(lo):
        return -jnp.sum(u * lo._matmul(jax.lax.stop_gradient(sol)))

    # every matvec operand in quad is stop-gradiented — skip the dead dv = Kᵀg MXU
    # product inside any fused-kernel VJP traced here (settings.skip_matvec_cotangent);
    # quad is linear in the matvec output, so the fused primal itself is dead too —
    # dispatch to the grad-only twins (settings.matvec_grad_only)
    with settings.skip_matvec_cotangent(True), settings.matvec_grad_only(True):
        _, vjp = jax.vjp(quad, linop)
        (linop_bar,) = vjp(jnp.ones((), dtype=sol.dtype))
    return linop_bar, u


_linear_solve_cg.defvjp(_linear_solve_cg_fwd, _linear_solve_cg_bwd)
