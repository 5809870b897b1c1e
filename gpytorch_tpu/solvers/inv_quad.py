"""mBCG inv_quad_logdet with the BBMM custom VJP — the core training-objective primitive.

Forward (reference: linear_operator inv_quad_logdet reached from
gpytorch/distributions/multivariate_normal.py:249; paper arXiv 1809.11165):
  * draw probe vectors z_j ~ N(0, P) from the pivoted-Cholesky preconditioner P (or N(0, I));
  * one batched preconditioned-CG solve of A⁻¹[rhs, ẑ₁..ẑ_t] (mBCG), extracting Lanczos
    tridiagonals T_j for the probe columns;
  * yᵀA⁻¹y from the rhs column; log|A| ≈ log|P| + n·mean_j e₁ᵀ log(T_j) e₁ (SLQ).

Backward (the part torch autograd does through linear_operator's custom Function — here an
explicit ``jax.custom_vjp``):
  * d(yᵀA⁻¹y) = −(A⁻¹y)ᵀ dA (A⁻¹y),  with A⁻¹y reused from the forward;
  * d log|A| = tr(A⁻¹ dA) ≈ mean_j ‖z_j‖² (A⁻¹ẑ_j)ᵀ dA (P⁻¹ẑ_j)   (E[z(P⁻¹z)ᵀ] = I);
  both delivered as a VJP through the operator's ``_matmul`` w.r.t. its parameters, so every
  structured operator gets gradients for free.

The preconditioner is built from a stop-gradient copy of the operator: it changes the
*estimator* (variance), never the gradient identity — matching the reference.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .. import settings
from .cg import linear_cg, tridiag_from_coeffs


@dataclasses.dataclass(frozen=True)
class _IQConfig:
    has_rhs: bool
    logdet: bool
    reduce_inv_quad: bool
    num_probes: int
    n_tridiag_iter: int
    max_iter: int
    tolerance: float
    skip_logdet_forward: bool
    precond_logdet_vr: bool = False
    # preconditioner/matvec knobs captured at call time: the custom-VJP backward is traced
    # AFTER the caller's settings contexts have exited, so it must not read ambient settings
    pc_rank: int = 15
    pc_min_size: int = 2000
    pc_noise_budget: float = 0.0
    pc_highest: bool = False
    use_pallas: bool = True
    mv_bf16: bool = False
    mv_highest: bool = False
    mv_high: bool = False
    mv_cbf16: bool = False
    fast_pc_grad: bool = True
    # one-pass bf16 K tiles in the BACKWARD's dK contractions only (forward solves keep
    # their precision).  The SLQ/BBMM hyper-gradient already carries 0.1-0.4% sampling
    # noise vs dense (probe variance), so the ~4e-3 relative bf16 rounding sits inside
    # the existing noise band while halving the backward kernel's MXU work
    grad_bf16: bool = False
    # warm-started solves: CG starts from the caller-supplied previous solution
    warm: bool = False
    # rhs-only warm mode: state carries only the rhs columns; probes are FRESH each call
    # (zero initial guess -> valid SLQ tridiagonals, unbiased probe draws) and only the rhs
    # columns gate CG convergence, so probe solves are truncated at whatever iterations the
    # warm rhs needed (>= n_tridiag_iter)
    warm_rhs: bool = False


# Host-level probe counter: when no explicit key is given and deterministic_probes is off,
# each *trace* of the objective gets a fresh seed (matching the reference's default of fresh
# probes per call).  Under jit re-execution the traced key is frozen — pass an explicit
# ``key`` per step (e.g. ``mll(output, y, key=k)``) for fresh probes inside a jitted loop.
_PROBE_COUNTER = [0]


def _resolve_probe_key(key: Optional[jax.Array], deterministic: Optional[bool] = None) -> jax.Array:
    if deterministic if deterministic is not None else settings.deterministic_probes.on():
        # Opt-in variance-reduction mode (reference: linear_operator settings.deterministic_probes):
        # identical probes every call → deterministic-but-biased logdet gradients.
        return jax.random.PRNGKey(0)
    if key is not None:
        if isinstance(key, int):
            return jax.random.PRNGKey(key)
        return key
    if settings.debug.on() and isinstance(jnp.zeros(()), jax.core.Tracer):
        # We are inside a jit trace with no explicit key: the counter below is baked into
        # the compiled executable, so re-executions reuse the SAME probes.  Warn loudly
        # (once per compile — warnings fire at trace time only).
        import warnings

        from ..utils.warnings import TracedProbeKeyWarning

        warnings.warn(
            "Drawing SLQ probe vectors inside jit without an explicit PRNG key: probes are "
            "frozen into the compiled step and will NOT refresh across iterations. Pass "
            "key= to the mll/inv_quad_logdet call (e.g. mll(output, y, key=step_key)).",
            TracedProbeKeyWarning,
        )
    _PROBE_COUNTER[0] += 1
    return jax.random.PRNGKey(_PROBE_COUNTER[0])


def inv_quad_logdet_mbcg(
    linop,
    inv_quad_rhs: Optional[jax.Array] = None,
    logdet: bool = False,
    reduce_inv_quad: bool = True,
    key: Optional[jax.Array] = None,
    config: Optional["settings.SolverConfig"] = None,
    solver_state: Optional[jax.Array] = None,
    return_state: bool = False,
) -> Tuple[Optional[jax.Array], Optional[jax.Array]]:
    """``config``: an explicit hashable :class:`settings.SolverConfig` (from
    ``settings.snapshot()``) overriding the ambient context-manager settings for the
    CG/SLQ knobs.  Use it as the static side-channel when jitting the same function under
    multiple solver configurations — global context state is only read at trace time and a
    cached executable silently ignores later config changes.

    ``solver_state`` / ``return_state`` — warm-started training solves (TPU-native
    extension; no reference analogue): pass the previous step's solves as
    ``solver_state`` and set ``return_state=True`` to get ``((iq, ld), new_state)``
    back.  Successive Adam steps move the hypers slowly, so CG started from the
    previous solves converges in a fraction of the iterations.  The state's COLUMN
    WIDTH selects the mode:

    * **rhs-only** (recommended) — state of shape (*batch, n, t_rhs): only the rhs
      solve is warm-started; probe vectors are drawn FRESH each call (pass a fresh
      ``key`` per step) with a zero initial guess, so the SLQ tridiagonals stay valid
      (the forward logdet is kept) and there is no frozen-probe gradient bias.  Only
      the rhs columns gate CG convergence — the probe solves are truncated at whatever
      iterations the warm rhs needed (at least ``max_lanczos_quadrature_iterations``).
      Pair with ``settings.precond_logdet_vr`` so the probe-truncation error lands on a
      small variance-reduced residual term instead of the whole logdet gradient.
    * **full-width** — state of shape (*batch, n, t_rhs + num_probes): all columns are
      warm-started.  Requires ``settings.skip_logdet_forward`` (Lanczos tridiagonals
      need a zero initial guess) and probe columns that mean the same thing step to
      step: WINDOWED keys (same explicit ``key`` for K consecutive steps, fresh each
      window, ZEROING the state at boundaries) or globally frozen probes
      (``settings.deterministic_probes``) — the latter makes the logdet-gradient
      sampling bias systematic, measurably stalling noise convergence over a long
      Adam run.

    The state carries no gradient."""
    has_rhs = inv_quad_rhs is not None
    sc = config if config is not None else settings.snapshot()
    cfg = _IQConfig(
        has_rhs=has_rhs,
        logdet=bool(logdet),
        reduce_inv_quad=bool(reduce_inv_quad),
        num_probes=int(sc.num_trace_samples),
        n_tridiag_iter=int(sc.max_lanczos_quadrature_iterations),
        max_iter=int(sc.max_cg_iterations),
        tolerance=float(sc.cg_tolerance),
        skip_logdet_forward=bool(sc.skip_logdet_forward),
        precond_logdet_vr=bool(getattr(sc, "precond_logdet_vr", False)),
        pc_rank=int(sc.max_preconditioner_size),
        pc_min_size=int(sc.min_preconditioning_size),
        pc_noise_budget=float(getattr(sc, "preconditioner_noise_budget", 0.0)),
        pc_highest=bool(getattr(sc, "preconditioner_highest_precision", False)),
        use_pallas=bool(getattr(sc, "use_pallas", True)),
        mv_bf16=bool(getattr(sc, "kernel_matvec_bf16", False)),
        mv_highest=bool(getattr(sc, "kernel_matvec_highest", False)),
        mv_high=bool(getattr(sc, "kernel_matvec_high", False)),
        mv_cbf16=bool(getattr(sc, "kernel_matvec_consistent_bf16", False)),
        fast_pc_grad=bool(getattr(sc, "fast_precond_grad", True)),
        grad_bf16=bool(getattr(sc, "mbcg_grad_bf16", False)),
    )
    n = linop.shape[-1]
    if has_rhs:
        rhs = inv_quad_rhs if inv_quad_rhs.ndim > 1 else inv_quad_rhs[:, None]
    else:
        rhs = jnp.zeros(linop.batch_shape + (n, 1), dtype=linop.dtype)
    if solver_state is not None:
        t_rhs = rhs.shape[-1] if has_rhs else 0
        t_total = t_rhs + (cfg.num_probes if cfg.logdet else 0)
        state_w = solver_state.shape[-1]
        if cfg.logdet and has_rhs and state_w == t_rhs and t_rhs < t_total:
            # rhs-only warm state: probes stay fresh/zero-init, tridiags stay valid —
            # no skip_logdet_forward requirement, no frozen-probe gradient bias
            cfg = dataclasses.replace(cfg, warm=True, warm_rhs=True)
        else:
            if state_w != max(t_total, 1):
                raise ValueError(
                    f"solver_state has {state_w} columns; expected {max(t_total, 1)} "
                    f"(full warm state) or {t_rhs} (rhs-only warm state)"
                )
            if cfg.logdet and not cfg.skip_logdet_forward:
                raise ValueError(
                    "full-width warm-started solves (solver_state) require "
                    "settings.skip_logdet_forward: the SLQ Lanczos tridiagonals are only "
                    "valid for a zero initial guess. Pass a state of only the rhs columns "
                    "(shape (*batch, n, t_rhs)) for the rhs-only warm mode, which keeps "
                    "the forward logdet and draws fresh probes each step."
                )
            cfg = dataclasses.replace(cfg, warm=True)
    else:
        t_total = (rhs.shape[-1] if has_rhs else 0) + (cfg.num_probes if cfg.logdet else 0)
        solver_state = jnp.zeros(linop.batch_shape + (rhs.shape[-2], max(t_total, 1)), dtype=rhs.dtype)
    iq, ld, solves = _mbcg_iq_logdet(
        cfg, linop, rhs,
        _resolve_probe_key(key, sc.deterministic_probes if config is not None else None),
        solver_state,
    )
    if has_rhs and inv_quad_rhs.ndim == 1 and not reduce_inv_quad:
        iq = iq[..., 0]
    out = (iq if has_rhs else None), (ld if logdet else None)
    if return_state:
        return out, solves
    return out


def _build_preconditioner(linop):
    linop_d = jax.tree_util.tree_map(
        lambda x: jax.lax.stop_gradient(x) if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x, linop
    )
    return linop_d._preconditioner()


def _mbcg_forward(cfg: _IQConfig, linop, rhs, key, x0):
    n = linop.shape[-1]
    batch = linop.batch_shape
    dt = rhs.dtype
    t_rhs = rhs.shape[-1] if cfg.has_rhs else 0

    # Row-sharded operators (distributed/sharded.py) run this whole routine per-device under
    # shard_map: local row blocks, psum'd reductions, identical CG trajectories everywhere.
    axis = getattr(linop, "shard_axis_name", None)

    def _rowsum(x):
        s = jnp.sum(x, axis=-2)
        return jax.lax.psum(s, axis) if axis is not None else s

    apply_P, P_op, logdet_P = _build_preconditioner(linop)

    probes = None
    norms = None
    if cfg.logdet:
        _global_probes = axis is not None and P_op is None and settings.sharded_global_probes.on()
        if axis is not None and not _global_probes:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        n_rows = rhs.shape[-2]  # local row count when sharded
        if P_op is not None:
            z = P_op.zero_mean_mvn_samples(key, cfg.num_probes)  # (t, *batch, n)
            z = jnp.moveaxis(z, 0, -1)  # (*batch, n, t)
        elif _global_probes:
            # matched-probe validation mode (settings.sharded_global_probes): every device
            # draws the GLOBAL (n, t) probe matrix from the same key and slices its row
            # block — a single-device solve with this key sees the identical probes
            from ..linop.base import probe_base_samples

            z_full = probe_base_samples(key, batch + (n, cfg.num_probes), dt)
            row0 = jax.lax.axis_index(axis) * n_rows
            z = jax.lax.dynamic_slice_in_dim(z_full, row0, n_rows, axis=-2)
        else:
            from ..linop.base import probe_base_samples

            z = probe_base_samples(key, batch + (n_rows, cfg.num_probes), dt)
        z = jax.lax.stop_gradient(z)
        norms = jnp.sqrt(jnp.maximum(_rowsum(z * z), 1e-20))[..., None, :]  # (*batch, 1, t)
        probes = z / norms
        rhs_all = jnp.concatenate([rhs, probes], axis=-1) if cfg.has_rhs else probes
    else:
        rhs_all = rhs

    # skip_logdet_forward: the SLQ tridiagonals feed ONLY the forward logdet value (the
    # gradient comes from the probe solves in the custom VJP), so skipping the forward also
    # lifts the n_tridiag_iter minimum-iteration floor — CG exits purely on
    # convergence/stagnation (reference skip_logdet_forward only skips the quadrature).
    n_tri = cfg.n_tridiag_iter if (cfg.logdet and not cfg.skip_logdet_forward) else 0
    x0_cg = None
    conv_cols = None
    if cfg.warm_rhs:
        # warm rhs columns + fresh zero-init probe columns; only the rhs gates the stop
        x0_cg = jnp.concatenate(
            [jax.lax.stop_gradient(x0), jnp.zeros_like(rhs_all[..., t_rhs:])], axis=-1
        ) if cfg.logdet else jax.lax.stop_gradient(x0)
        conv_cols = t_rhs
    elif cfg.warm:
        x0_cg = jax.lax.stop_gradient(x0)
    result = linear_cg(
        lambda v: linop._matmul(v),
        rhs_all,
        precond_fn=apply_P,
        max_iter=cfg.max_iter,
        tolerance=cfg.tolerance,
        n_tridiag_iter=n_tri,
        axis_name=axis,
        global_n=n,
        x0=x0_cg,
        conv_cols=conv_cols,
        # settings.cg_lagged_rhs: fold the warm-start residual matvec into the first
        # iteration (read at trace time — the caller's settings context is active here)
        lagged_rhs_init=cfg.warm_rhs and settings.cg_lagged_rhs.on(),
    )
    solves = result.solution

    iq = jnp.zeros(batch, dtype=dt)
    s_rhs = None
    if cfg.has_rhs:
        s_rhs = solves[..., :t_rhs]
        iq = _rowsum(rhs * s_rhs)  # (*batch, t_rhs)
        if cfg.reduce_inv_quad:
            iq = jnp.sum(iq, axis=-1)

    ld = jnp.zeros(batch, dtype=dt)
    s_probe = None
    Pinv_probes = None
    if cfg.logdet:
        s_probe = solves[..., t_rhs:]
        # None (pytree structure, hence a STATIC marker for the backward) when no
        # preconditioner was active — the backward then uses the raw probes
        Pinv_probes = jax.lax.stop_gradient(apply_P(probes)) if apply_P is not None else None
        if not cfg.skip_logdet_forward:
            alphas = result.alphas[..., t_rhs:]  # (m, *batch, t_probe)
            betas = result.betas[..., t_rhs:]
            T = tridiag_from_coeffs(alphas, betas)  # (*batch, t, m, m)
            sym_dt = settings._linalg_dtype_symeig.dtype()
            if sym_dt is not None and jnp.finfo(sym_dt).bits > jnp.finfo(T.dtype).bits:
                lam, V = jnp.linalg.eigh(T.astype(sym_dt))
                lam, V = lam.astype(T.dtype), V.astype(T.dtype)
            else:
                lam, V = jnp.linalg.eigh(T)
            # settings.tridiagonal_jitter: floor for the Lanczos-tridiagonal Ritz values
            # before the log (reference linear_operator knob).  At healthy conditioning the
            # Ritz values are far above the floor, so this is bit-neutral there.
            lam = jnp.maximum(lam, jnp.asarray(settings.tridiagonal_jitter.value(), lam.dtype))
            w = V[..., 0, :] ** 2  # e₁ weights
            slq = jnp.sum(w * jnp.log(lam), axis=-1)  # (*batch, t)
            ld = n * jnp.mean(slq, axis=-1)
            if logdet_P is not None:
                ld = ld + logdet_P.astype(dt)
    residuals = (linop, rhs, key, s_rhs, probes, norms, s_probe, Pinv_probes)
    # solves is returned (stop-gradiented) as the warm-start state for the next step;
    # rhs-only warm mode carries just the rhs columns (probes are redrawn fresh anyway)
    state_out = solves[..., :t_rhs] if cfg.warm_rhs else solves
    return (iq, ld, jax.lax.stop_gradient(state_out)), residuals


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _mbcg_iq_logdet(cfg: _IQConfig, linop, rhs, key, x0):
    out, _ = _mbcg_forward(cfg, linop, rhs, key, x0)
    return out


def _mbcg_fwd(cfg, linop, rhs, key, x0):
    return _mbcg_forward(cfg, linop, rhs, key, x0)


def _mbcg_bwd(cfg, residuals, g):
    linop, rhs, key, s_rhs, probes, norms, s_probe, Pinv_probes = residuals
    # Pinv_probes is None (pytree structure → static) when the forward ran unpreconditioned
    _had_precond = Pinv_probes is not None
    if not _had_precond and cfg.logdet:
        Pinv_probes = probes
    g_iq, g_ld, _ = g  # solves output is stop-gradiented state — its cotangent is discarded
    axis = getattr(linop, "shard_axis_name", None)

    def _rowsum(x):
        s = jnp.sum(x, axis=-2)
        return jax.lax.psum(s, axis) if axis is not None else s

    def scalar_fn(lo):
        # ONE streaming matvec pass over the concatenated right-hand sides — the kernel
        # tile (distances + elementwise) is recomputed once instead of once per term
        total = jnp.zeros((), dtype=rhs.dtype)
        t_rhs = s_rhs.shape[-1] if cfg.has_rhs else 0
        cols = []
        if cfg.has_rhs:
            cols.append(jax.lax.stop_gradient(s_rhs))
        if cfg.logdet:
            cols.append(jax.lax.stop_gradient(Pinv_probes))
        K_all = lo._matmul(jnp.concatenate(cols, axis=-1) if len(cols) > 1 else cols[0])
        if cfg.has_rhs:
            s = jax.lax.stop_gradient(s_rhs)
            quad = _rowsum(s * K_all[..., :t_rhs])  # (*batch, t)
            if cfg.reduce_inv_quad:
                quad = jnp.sum(quad, axis=-1)  # (*batch,)
            total = total - jnp.sum(g_iq * quad)
        if cfg.logdet:
            sp = jax.lax.stop_gradient(s_probe)
            est = _rowsum(sp * K_all[..., t_rhs:])  # (*batch, t)
            pz = jax.lax.stop_gradient(Pinv_probes)
            if cfg.precond_logdet_vr and _had_precond:
                # Variance-reduced form (arXiv 2107.00243): the analytic d log|P| term plus
                # the residual  E[(K̂⁻¹z)ᵀ dK̂ (P⁻¹z) − (P⁻¹z)ᵀ dP (P⁻¹z)], z∼N(0,P).
                # Unbiased for any P (E[z(P⁻¹z)ᵀ]=I and E[(P⁻¹z)(P⁻¹z)ᵀ]=P⁻¹); the
                # stochastic part vanishes as P→K̂.  P is rebuilt differentiably from the
                # traced operator: k kernel rows, O(nk²) — negligible next to the matvec.
                _, P_op2, logdet_P2 = lo._preconditioner()
                est = est - _rowsum(pz * P_op2._matmul(pz))  # (*batch, t)
                est = jnp.mean(jax.lax.stop_gradient(norms[..., 0, :]) ** 2 * est, axis=-1)
                est = est + logdet_P2.astype(est.dtype)
            else:
                est = jnp.mean(jax.lax.stop_gradient(norms[..., 0, :]) ** 2 * est, axis=-1)  # (*batch,)
            total = total + jnp.sum(g_ld * est)
        return total

    # re-enter ALL call-time preconditioner/matvec knobs: scalar_fn is traced HERE, outside
    # the caller's settings contexts — the VR branch rebuilds P via lo._preconditioner(),
    # and lo._matmul reads the pallas/precision flags at trace time.  Without this the
    # backward's numerics silently follow whatever flags are ambient at bwd-trace time
    # (e.g. an f32 backward matvec under a bf16-trained forward, or a VR d log|P| built
    # from an un-τ-regularized P — a biased gradient).
    # cfg.grad_bf16 (settings.mbcg_grad_bf16): the backward's dK contractions run one-pass
    # bf16 K tiles regardless of the forward solve precision — the hyper-gradient is an
    # SLQ estimate with 0.1-0.4% probe-sampling noise, so bf16 rounding (~4e-3 relative)
    # is inside the existing band while halving the backward kernel's MXU work
    _g_bf16 = cfg.grad_bf16
    with settings.max_preconditioner_size(cfg.pc_rank), settings.min_preconditioning_size(cfg.pc_min_size), \
            settings.preconditioner_noise_budget(cfg.pc_noise_budget), \
            settings.preconditioner_highest_precision(cfg.pc_highest), \
            settings.use_pallas(cfg.use_pallas), \
            settings.kernel_matvec_bf16(True if _g_bf16 else cfg.mv_bf16), \
            settings.kernel_matvec_highest(False if _g_bf16 else cfg.mv_highest), \
            settings.kernel_matvec_high(False if _g_bf16 else cfg.mv_high), \
            settings.kernel_matvec_consistent_bf16(False if _g_bf16 else cfg.mv_cbf16), \
            settings.fast_precond_grad(cfg.fast_pc_grad), \
            settings.skip_matvec_cotangent(True), settings.matvec_grad_only(True):
        _, vjp = jax.vjp(scalar_fn, linop)
        # the cotangent application must ALSO run inside the with-block: nested custom-vjp
        # backwards (e.g. _fkm_bwd → _bwd_fused_pallas, which reads use_pallas and the
        # kernel_matvec_* flags) are traced when vjp() is called, not at jax.vjp()
        (linop_bar,) = vjp(jnp.ones((), dtype=rhs.dtype))

    if cfg.has_rhs:
        if cfg.reduce_inv_quad:
            rhs_bar = 2.0 * s_rhs * jnp.reshape(g_iq, g_iq.shape + (1, 1))
        else:
            rhs_bar = 2.0 * s_rhs * g_iq[..., None, :]
    else:
        rhs_bar = jnp.zeros_like(rhs)
    # PRNG keys carry no gradient: their cotangent type is float0.
    import numpy as np

    key_bar = np.zeros(np.shape(key), dtype=jax.dtypes.float0)
    # warm-start state carries no gradient (stop-gradiented on entry); shape must mirror
    # the x0 input exactly — cold calls pass a max(t,1)-column zeros placeholder
    if cfg.warm_rhs:
        t_state = s_rhs.shape[-1]
    else:
        t_state = (s_rhs.shape[-1] if cfg.has_rhs else 0) + (probes.shape[-1] if cfg.logdet else 0)
        if not cfg.warm:
            t_state = max(t_state, 1)
    x0_bar = jnp.zeros(rhs.shape[:-1] + (t_state,), dtype=rhs.dtype)
    return linop_bar, rhs_bar, key_bar, x0_bar


_mbcg_iq_logdet.defvjp(_mbcg_fwd, _mbcg_bwd)
