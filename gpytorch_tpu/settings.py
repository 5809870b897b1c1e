"""Global configuration context managers.

Reference: gpytorch/settings.py (``_feature_flag`` :84, ``_value_context`` :122,
``_dtype_value_context`` :35) plus the solver knobs re-exported from ``linear_operator.settings``
(gpytorch/settings.py:6-31).

JAX note: these are *trace-time* settings.  The values are read while a function is being traced
and get baked into the compiled program — exactly what you want for solver iteration counts and
feature flags.  Do **not** flip a setting between calls of an already-jitted function and expect
the compiled code to change; wrap the jitted call in the context instead (the snapshot is then
part of your closure), or pass an explicit :func:`snapshot` as a static argument.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any, Optional

logger = logging.getLogger("gpytorch_tpu")


class _feature_flag:
    """On/off context flag with a class default (reference: gpytorch/settings.py:84)."""

    _default = False
    _state: Optional[bool] = None

    def __init__(self, state: bool = True):
        self.state = state

    @classmethod
    def is_default(cls) -> bool:
        return cls._state is None

    @classmethod
    def on(cls) -> bool:
        return cls._default if cls._state is None else cls._state

    @classmethod
    def off(cls) -> bool:
        return not cls.on()

    @classmethod
    def _set_state(cls, state):
        cls._state = state

    def __enter__(self):
        self.prev = type(self)._state
        type(self)._set_state(self.state)
        return self

    def __exit__(self, *exc):
        type(self)._set_state(self.prev)
        return False


class _value_context:
    """Scalar-valued context (reference: gpytorch/settings.py:122)."""

    _global_value: Any = None

    def __init__(self, value):
        self._value = value

    @classmethod
    def value(cls):
        return cls._global_value

    @classmethod
    def _set_value(cls, value):
        cls._global_value = value

    def __enter__(self):
        self.prev = type(self)._global_value
        type(self)._set_value(self._value)
        return self

    def __exit__(self, *exc):
        type(self)._set_value(self.prev)
        return False


class _dtype_value_context:
    """Per-dtype values, e.g. cholesky jitter (reference: gpytorch/settings.py:35)."""

    _global_float_value: Any = None
    _global_double_value: Any = None
    _global_half_value: Any = None

    def __init__(self, float_value=None, double_value=None, half_value=None):
        self._float = float_value
        self._double = double_value
        self._half = half_value

    @classmethod
    def value(cls, dtype=None):
        import jax.numpy as jnp

        if dtype is None:
            return cls._global_float_value
        dtype = jnp.dtype(dtype)
        if dtype == jnp.float64:
            return cls._global_double_value
        if dtype in (jnp.float16, jnp.bfloat16):
            return cls._global_half_value
        return cls._global_float_value

    def __enter__(self):
        cls = type(self)
        self.prev = (cls._global_float_value, cls._global_double_value, cls._global_half_value)
        if self._float is not None:
            cls._global_float_value = self._float
        if self._double is not None:
            cls._global_double_value = self._double
        if self._half is not None:
            cls._global_half_value = self._half
        return self

    def __exit__(self, *exc):
        cls = type(self)
        cls._global_float_value, cls._global_double_value, cls._global_half_value = self.prev
        return False


# --------------------------------------------------------------------------------------------
# Solver knobs (reference: linear_operator.settings, imported at gpytorch/settings.py:6-31)
# --------------------------------------------------------------------------------------------

class cg_tolerance(_value_context):
    _global_value = 1.0


class eval_cg_tolerance(_value_context):
    """Tighter CG tolerance for posterior inference (reference: gpytorch/settings.py:173)."""
    _global_value = 0.01


class max_cg_iterations(_value_context):
    _global_value = 1000


class max_cholesky_size(_value_context):
    """N below which dense Cholesky is used instead of CG (reference default 800)."""
    _global_value = 800


class max_eager_kernel_size(_value_context):
    """Kernels smaller than this are evaluated eagerly (reference: gpytorch/settings.py:261)."""
    _global_value = 512


class max_preconditioner_size(_value_context):
    _global_value = 15


class min_preconditioning_size(_value_context):
    _global_value = 2000


class preconditioner_tolerance(_value_context):
    _global_value = 1e-3


class num_trace_samples(_value_context):
    _global_value = 10


class max_lanczos_quadrature_iterations(_value_context):
    _global_value = 20


class max_root_decomposition_size(_value_context):
    _global_value = 100


class num_contour_quadrature(_value_context):
    _global_value = 15


class minres_tolerance(_value_context):
    _global_value = 1e-4


class max_minres_iterations(_value_context):
    _global_value = 100


class ciq_samples(_feature_flag):
    _default = False


class skip_logdet_forward(_feature_flag):
    _default = False


class deterministic_probes(_feature_flag):
    _default = False


class precond_logdet_vr(_feature_flag):
    """Variance-reduced logdet gradient (Wenger et al., arXiv 2107.00243): when a
    pivoted-Cholesky preconditioner P is active, estimate
    d log|K̂| = d log|P| (analytic) + E_z[(K̂⁻¹z)ᵀ dK̂ (P⁻¹z) − (P⁻¹z)ᵀ dP (P⁻¹z)], z∼N(0,P)
    instead of the plain Hutchinson form — unbiased either way, but the stochastic residual
    shrinks as P→K̂, so hyperparameter gradients are far less noisy per probe (measured
    3–15× std reduction at 8 probes with converged CG).  TPU-extra beyond the reference
    (linear_operator uses the plain estimator).

    Opt-in: the derivation assumes (K̂⁻¹z) is solved accurately.  Under the bench's
    stagnation-truncated bf16 CG the plain estimator's truncation bias partially cancels
    across its large terms while the VR split exposes it, which measurably degraded
    N=100k training quality — enable for tight-tolerance (f32-HIGHEST / small-N) training."""

    _default = False


class sharded_global_probes(_feature_flag):
    """Row-sharded mBCG (distributed/sharded.py): draw the SLQ probe matrix from the key
    at its GLOBAL (n_global, t) shape on every device and slice the local row block,
    instead of the default per-device ``fold_in(key, axis_index)`` draw.

    With this on, a sharded solve and a single-device solve given the same key see the
    IDENTICAL probe matrix, so their CG trajectories agree to rounding — the matched-probe
    near-exact validation mode (tests/test_sharded_general.py, __graft_entry__ leg 5).
    Costs a full (n_global, t) normal draw per device, so it is a TEST/VALIDATION knob,
    not a production default.  Unpreconditioned draws only (a preconditioned probe draw
    z ~ N(0, P) depends on the local P factor layout)."""

    _default = False


class skip_matvec_cotangent(_feature_flag):
    """Inside a fused ``fused_kernel_matvec`` VJP, skip computing the cotangent of the
    right-hand side ``v`` (the ``dv = Kᵀ g`` product) and return zeros for it.

    ONLY safe where ``v`` provably carries no gradient — the mBCG backward
    (solvers/inv_quad.py::_mbcg_bwd) and the CG-solve backward
    (solvers/cg.py::_linear_solve_cg_bwd) stop-gradient every matvec operand, so JAX
    discards the dv cotangent *after* it is computed; the Pallas kernel is opaque to XLA,
    so without this flag that dead ``Kᵀ g`` costs a full lane-packed MXU product
    (~25 ms at N=100k — roughly one extra matvec per training step).  Entered
    automatically by those backwards; not a user knob.  TPU-specific; no reference
    analogue (torch autograd prunes the dead branch at graph level)."""

    _default = False


class matvec_grad_only(_feature_flag):
    """Dispatch fused kernel matvecs to their *grad-only* twin primitives: the primal
    returns zeros **without running the Pallas kernel**; the VJP is unchanged.

    ONLY safe where every op downstream of the matvec output is linear in it, so the
    cotangent computation never reads the primal values.  That is exactly the mBCG
    backward's ``scalar_fn`` (solvers/inv_quad.py::_mbcg_bwd): the quad/logdet gradient
    estimators are weighted sums of ``s ⊙ (K s')`` terms whose VJP w.r.t. the kernel
    hyperparameters needs only the saved factors ``(s, s')`` — but ``jax.vjp`` executes
    the primal anyway, and the Pallas call is opaque to XLA DCE, costing one full
    streaming matvec (~35 ms at N=100k) whose output is provably dead.  Entered
    automatically by that backward; not a user knob.  TPU-specific; no reference
    analogue (torch's _quad_form_derivative never runs a forward matmul —
    /root/reference — linear_operator ``_quad_form_derivative``)."""

    _default = False


class rademacher_probes(_feature_flag):
    """Draw SLQ/Hutchinson probe base vectors as Rademacher (±1) instead of standard
    normal: z = R·r (+ D^{1/2}·r₂ for LLᵀ+D preconditioner samples) with r ∈ {−1,+1}ⁿ.

    E[zzᵀ] is unchanged (the estimators only need the covariance), but the quadratic-form
    estimator variance drops: Var[rᵀAr] = 2(‖A‖²_F − Σᵢ A²ᵢᵢ) vs the Gaussian 2‖A‖²_F —
    strictly smaller, by a lot when A is diagonal-heavy (Hutchinson 1990; Avron &
    Toledo 2011).  Free: a Rademacher draw is cheaper than a normal draw.  Applies to
    the mBCG probe stream (solvers/inv_quad.py) and preconditioner-distributed draws
    (linop/root.py).  The reference draws Gaussian (and optionally normalizes) —
    linear_operator utils/probe_vectors; Rademacher is the standard lower-variance
    choice in the SLQ literature (Ubaru et al. 2017)."""

    _default = False


class mbcg_grad_bf16(_feature_flag):
    """Run the mBCG backward's dK contractions (the fused backward kernel's K tiles) in
    one-pass bf16, regardless of the forward solve precision.

    The BBMM/SLQ hyperparameter gradient is a stochastic estimate whose probe-sampling
    noise is 0.1-0.4% of the dense gradient (measured per-parameter vs Cholesky at the
    N=100k flagship); one-pass bf16 rounding contributes ~4e-3 *relative* — inside that
    band — while halving the backward kernel's MXU work.  Forward solves (CG residuals,
    SLQ tridiagonals, preconditioner applies) keep their configured precision: solve
    accuracy gates quality much harder than gradient rounding.  Captured into the mBCG
    custom-VJP config at call time (solvers/inv_quad.py::_IQConfig.grad_bf16).
    TPU-native extension; the reference runs f32/f64 autograd throughout
    (/root/reference/gpytorch/functions/_inv_quad_logdet.py)."""

    _default = False


class fast_precond_grad(_feature_flag):
    """Gradient of the pivoted-Cholesky preconditioner root via the fixed-pivot Nyström
    form (value stays the scan-built factor through a stop-gradient straddle, so forward
    numbers — probe streams, CG preconditioning, log|P| values — are bit-identical).

    Partial pivoted Cholesky after k steps equals the Nyström approximation on its pivot
    set, K[:,p] K[p,p]⁻¹ K[p,:], so for a fixed pivot order both parameterizations are the
    same function of the kernel hyperparameters and their gradients agree to rounding.
    The Nyström VJP is one k×k Cholesky + a (k, n) triangular solve instead of a reverse
    sweep through the k-step scan carrying (n, k) residuals — measured ~40 ms/step cheaper
    in the variance-reduced logdet backward (settings.precond_logdet_vr) at the N=100k
    rank-50 flagship.  TPU-native extension; no reference analogue (torch autograd
    differentiates the scan there)."""

    _default = True


class preconditioner_noise_budget(_value_context):
    """Relative accuracy budget of the preconditioner APPLY, used to τ-regularize P.

    At f32, P⁻¹v carries relative noise ~eps·cond(P); A amplifies it λ_max-fold, so a
    full-strength preconditioner with cond(P) ≈ λ_max/σ² ~ 1e5 stalls tight-tolerance CG
    at O(1) true residual (measured at the N=100k bench).  With a budget b > 0 the
    preconditioner is built as P_τ = LLᵀ + τI, τ = max(σ², λ_max·eps/b): cond(P_τ) ≤ b/eps,
    bounding the apply-noise floor at ≈ b while still collapsing the top of the spectrum.
    Costs ≈ √(τ/σ²) more CG iterations than an exact-arithmetic P — still far below
    unpreconditioned.  0 (default) disables the regularization (exact P = LLᵀ + D)."""

    _global_value = 0.0


class preconditioner_highest_precision(_feature_flag):
    """Run the O(nk²) pivoted-Cholesky / Woodbury-preconditioner matmuls at
    Precision.HIGHEST instead of the TPU one-pass bf16 default.

    Needed for an accurate reverse-mode d log|P| when ``precond_logdet_vr`` is enabled
    (the one-pass rounding bias scales with n); enable the two flags together.  Off by
    default: P is only a preconditioner — 5e-3-level perturbations of L are harmless to
    CG and the plain estimator, while changing L perturbs the probe stream z ∼ N(0, P)
    (bisected at N=100k: flipping this alone moved bench training RMSE 0.18 → 0.43 by
    landing in a different hyperparameter basin)."""

    _default = False


class terminate_cg_by_size(_feature_flag):
    _default = False


class cg_stall_window(_value_context):
    """Stop CG after this many iterations without residual improvement (TPU-specific:
    one-pass matmul rounding gives a residual noise floor that tolerance exits never
    cross).  Raise for tight-tolerance evaluation solves on ill-conditioned systems."""
    _global_value = 10


class cg_lagged_rhs(_feature_flag):
    """rhs-warm mBCG: fold the warm-start residual matvec INTO the first CG iteration.

    A warm start needs r₀ = b − A x₀ — normally one extra full-width matvec before the
    loop (the fused matvec is flat in columns, so the 1-column x₀ costs a full ~35 ms
    pass at N=100k).  Instead, start the warm rhs column at x=0, r=b, p=x₀ and force its
    first iteration coefficients to α=1, β=0: the iteration's ordinary algebra
    x ← x + α·p = x₀ and r ← r − α·A p = b − A x₀ IS the warm-start initialization, and
    the probe columns run their ordinary first Krylov iteration in the same matvec.
    Net: NTRI matvecs instead of NTRI+1 per training step; the warm rhs column receives
    NTRI−1 in-loop updates (it is convergence-gated, so the loop continues past the
    floor if it ever needs more).  TPU-specific scheduling; no reference analogue."""

    _default = False


class cg_unroll(_value_context):
    """Unroll up to this many of CG's mandatory floor iterations (the first
    ``n_tridiag_iter`` iterations, which the while-loop condition forces to run
    regardless of convergence) as straight-line XLA code before entering the
    ``lax.while_loop``.  Semantically identical to the pure while-loop — the unrolled
    phase is exactly the iterations the loop could never skip — but XLA can fuse across
    the straight-line iterations and drops the loop bookkeeping, which matters when the
    floor IS the whole solve (the rhs-warm flagship runs exactly NTRI iterations).
    0 disables.  TPU-specific; no reference analogue."""
    _global_value = 0


class solve_column_chunk(_value_context):
    """Max rhs columns per CG dispatch in eager (non-jit) ``LinearOperator.solve`` calls.

    0 (default) = one dispatch for the full rhs.  When set, wide solves (e.g. the
    2048-column exact-posterior-covariance solve of the N=100k joint-NLPD eval) are
    split into column chunks with a host sync between dispatches, bounding the length
    of any single uninterrupted device program — a ~25 s single program has twice
    crashed the tunneled TPU worker (BENCH r02/r03).  The chunks solve the identical
    system (CG is column-independent), so results match the one-shot solve to solver
    tolerance.  Ignored under jit tracing (host syncs are impossible there) and on the
    Cholesky path (already a short program).  TPU-only concern; no reference analogue."""
    _global_value = 0


class solve_iterative_refinements(_value_context):
    """Iterative-refinement passes after each CG solve: x ← x + CG(A, b − A x).

    The TPU substitute for the reference's f64 promotion (settings.linalg_dtypes):
    each pass re-solves against an accurately-computed residual, recovering digits the
    f32 Krylov recursion loses on ill-conditioned (small-noise, large-N) systems.
    Costs one extra CG per pass — enable for posterior evaluation."""
    _global_value = 0


class tridiagonal_jitter(_value_context):
    _global_value = 1e-6


class cholesky_jitter(_dtype_value_context):
    _global_float_value = 1e-6
    _global_double_value = 1e-8
    _global_half_value = 1e-3


class cholesky_max_tries(_value_context):
    _global_value = 3


class _linalg_dtype_cholesky(_value_context):
    """Dtype that dense Cholesky factorizations are promoted to (reference:
    linear_operator settings._linalg_dtype_cholesky, default double).

    TPU note: f64 is unavailable on TPU — the promotion applies only when
    ``jax_enable_x64`` is on (CPU/GPU); on TPU use ``solve_iterative_refinements`` /
    ``kernel_matvec_highest`` as the numerical-parity substitute (SURVEY §7 hard parts)."""

    _global_value = "float64"

    @classmethod
    def dtype(cls):
        """Resolved jnp dtype, or None when promotion is unavailable/disabled."""
        import jax
        import jax.numpy as jnp

        v = cls.value()
        if v is None:
            return None
        dt = jnp.dtype(v) if not hasattr(v, "dtype") else jnp.dtype(v)
        if dt == jnp.dtype("float64") and not jax.config.jax_enable_x64:
            return None
        return dt


class _linalg_dtype_symeig(_linalg_dtype_cholesky):
    """Dtype for dense symmetric eigendecompositions (reference parity)."""

    _global_value = "float64"


class linalg_dtypes:
    """Compound context setting the Cholesky/symeig promotion dtypes at once
    (reference: linear_operator settings.linalg_dtypes)."""

    def __init__(self, default=None, symeig=None, cholesky=None):
        default = "float64" if default is None else default  # reference default: double
        self._chol = _linalg_dtype_cholesky(cholesky if cholesky is not None else default)
        self._sym = _linalg_dtype_symeig(symeig if symeig is not None else default)

    def __enter__(self):
        self._chol.__enter__()
        self._sym.__enter__()
        return self

    def __exit__(self, *exc):
        self._sym.__exit__(*exc)
        self._chol.__exit__(*exc)
        return False


class use_toeplitz(_feature_flag):
    _default = True


class verbose_linalg(_feature_flag):
    """Log every linalg routine dispatch (reference: linear_operator settings, :30)."""
    _default = False


class _fast_covar_root_decomposition(_feature_flag):
    _default = True


class _fast_log_prob(_feature_flag):
    _default = True


class _fast_solves(_feature_flag):
    _default = True


class fast_computations:
    """Reference: linear_operator fast_computations triple flag (gpytorch/settings.py:9)."""

    covar_root_decomposition = _fast_covar_root_decomposition
    log_prob = _fast_log_prob
    solves = _fast_solves

    def __init__(self, covar_root_decomposition=True, log_prob=True, solves=True):
        self._ctxs = [
            _fast_covar_root_decomposition(covar_root_decomposition),
            _fast_log_prob(log_prob),
            _fast_solves(solves),
        ]

    def __enter__(self):
        for c in self._ctxs:
            c.__enter__()
        return self

    def __exit__(self, *exc):
        for c in self._ctxs:
            c.__exit__(*exc)
        return False


# --------------------------------------------------------------------------------------------
# GPyTorch-specific flags (reference: gpytorch/settings.py:147-509)
# --------------------------------------------------------------------------------------------

class debug(_feature_flag):
    """Extra validation (train-input identity checks etc.); reference :147."""
    _default = True


class detach_test_caches(_feature_flag):
    """Stop gradients through prediction caches (reference :160)."""
    _default = True


class fast_pred_var(_feature_flag):
    """LOVE fast predictive variances (reference :183)."""
    _default = False


class fast_pred_samples(_feature_flag):
    """LOVE fast posterior sampling (reference :225)."""
    _default = False


class lazily_evaluate_kernels(_feature_flag):
    """Return LazyEvaluatedKernelTensor from Kernel.__call__ (reference :246)."""
    _default = True


class memory_efficient(_feature_flag):
    _default = False


class min_fixed_noise(_dtype_value_context):
    """Clamp for fixed noise (reference :284)."""
    _global_float_value = 1e-4
    _global_double_value = 1e-6
    _global_half_value = 1e-3


class min_variance(_dtype_value_context):
    """Clamp for posterior variances (reference :299)."""
    _global_float_value = 1e-6
    _global_double_value = 1e-10
    _global_half_value = 1e-3


class num_gauss_hermite_locs(_value_context):
    _global_value = 20


class num_likelihood_samples(_value_context):
    _global_value = 10


class prior_mode(_feature_flag):
    """Force models to return prior predictions (reference :336)."""
    _default = False


class sgpr_diagonal_correction(_feature_flag):
    _default = True


class skip_posterior_variances(_feature_flag):
    _default = False


class trace_mode(_feature_flag):
    """Force dense (non-lazy) evaluation, for export/tracing (reference :373)."""
    _default = False


class variational_cholesky_jitter(_dtype_value_context):
    _global_float_value = 1e-4
    _global_double_value = 1e-6
    _global_half_value = 1e-3


class observation_nan_policy(_value_context):
    """'ignore' | 'mask' | 'fill' (reference :407)."""
    _global_value = "ignore"


class use_pallas(_feature_flag):
    """Use hand-written Pallas TPU kernels for hot ops (the KeOps analogue;
    reference flag: settings.use_keops gpytorch/settings.py:453)."""
    _default = True


# -- linalg call counting (cache-contract testing) ---------------------------------------
# The reference asserts CACHING as a contract: its VariationalTestCase counts cholesky/CG
# invocations via mock contexts (gpytorch/test/variational_test_case.py:268-299) and its
# memoize framework is itself tested (gpytorch/utils/memoize.py:12-145).  JAX analogue:
# the framework's primitives bump a counter when a ``count_linalg_calls`` context is
# active.  Counts are TRACE-time: a jitted function counts once per trace, eager calls
# count per call — exactly the granularity at which the framework's eager caches
# (prediction strategies, variational Cholesky factors) either rebuild work or don't.
_CALL_COUNTS = None


def _count_call(name: str) -> None:
    if _CALL_COUNTS is not None:
        _CALL_COUNTS[name] = _CALL_COUNTS.get(name, 0) + 1


class count_linalg_calls:
    """Context manager: ``with settings.count_linalg_calls() as counts: ...``.

    ``counts`` is a live dict of primitive-name -> invocation count.  Counted primitives:
    ``psd_safe_cholesky``, ``linear_cg``, ``lanczos_tridiag``, ``lanczos_root``,
    ``pivoted_cholesky``,
    ``kernel_forward`` (an actual kernel-matrix evaluation, not a lazy wrapper build).
    Nesting restores the outer counter on exit (inner counts are NOT folded into it).
    """

    def __init__(self):
        self._prev = None
        self.counts = {}

    def __enter__(self):
        global _CALL_COUNTS
        self._prev = _CALL_COUNTS
        _CALL_COUNTS = self.counts
        return self.counts

    def __exit__(self, *exc):
        global _CALL_COUNTS
        _CALL_COUNTS = self._prev
        return False


class pallas_interpret(_feature_flag):
    """Run the Pallas kernel bodies in interpreter mode on any backend (CPU included).

    Testing knob: executes the exact tiled kernel code (grids, BlockSpecs, padding, the
    bf16/HIGHEST arithmetic branches) without a TPU — the off-chip analogue of the
    reference's KeOps==plain assertions (gpytorch/test/base_keops_test_case.py)."""
    _default = False


class kernel_matvec_bf16(_feature_flag):
    """Compute the K·V tile of the fused Pallas matvec in bfloat16 (f32 accumulation).

    2× MXU throughput on the CG hot loop; per-element rounding (~2⁻⁹ relative on kernel
    values in [0,1]) is absorbed by CG's residual recurrences.  No reference equivalent
    (TPU-specific; closest knob is settings.linalg_dtypes / fast_computations).

    .. warning:: Measured on v5e at N=100k (d=3 RBF): the fused matvec is VPU/exp-bound, so
       bf16 K·V tiles do NOT reduce wall-clock (~25 ms either way at t=33 columns) — but
       their ~5e-3 rounding floor STALLS CG above the accuracy the BBMM training gradients
       need, and the resulting yᵀK̂⁻¹y underestimate drives a joint noise/outputscale scale
       collapse (measured: true MLL/N −3.3 at the collapsed point vs +0.27 at the optimum;
       test NLL 1.26 vs −1.14).  For TRAINING, prefer ``kernel_matvec_highest`` with a
       cg_tolerance of ~1e-3; use bf16 tiles only where solve accuracy provably doesn't
       matter (e.g. preconditioner probes)."""
    _default = False


class kernel_matvec_highest(_feature_flag):
    """Run the K·V tile of the fused Pallas matvec at Precision.HIGHEST (6-pass f32).

    TPU matmuls default to one-pass bf16 rounding (~5e-3 relative); CG cannot converge
    below that floor, so tight-tolerance *evaluation* paths (posterior means/variances to
    1e-3, reference parity checks) should enable this.  ~3× slower matvec — eval only.
    Ignored when kernel_matvec_bf16 is on."""
    _default = False


class kernel_matvec_high(_feature_flag):
    """Run the K·V tile of the fused Pallas matvec at ~Precision.HIGH (3-pass bf16 hi/lo).

    Middle ground between the one-pass default (~5e-3 relative rounding, stalls CG) and
    the 6-pass HIGHEST (full f32, ~2× the MXU passes of this mode): each operand is split
    into bf16 hi + lo parts and the ``lo·lo`` cross term is dropped, giving ~1e-5 relative
    error — far below CG's training tolerances — at half HIGHEST's MXU cost.  Mosaic does
    not lower ``Precision.HIGH`` inside Pallas kernels, so the split is done by hand in
    the kernel body.  Like ``kernel_matvec_highest``, this also forces the tight-precision
    preconditioner arithmetic (the O(nk) pivoted-Cholesky/Woodbury ops run at HIGHEST —
    they are cheap and their apply noise otherwise stalls preconditioned CG).
    Ignored when kernel_matvec_bf16 or kernel_matvec_highest is on."""
    _default = False


class kernel_matvec_consistent_bf16(_feature_flag):
    """One-MXU-pass K·V tiles with a CONSISTENT bf16 operator (K̃ = bf16(K), V exact).

    The one-pass default's CG stall comes from rounding *V* per call — an input
    perturbation that changes every iteration, so the applied map is not a fixed linear
    operator and the residual recurrence floors at ~5e-3.  Rounding *K* is different: the
    tile is identical every iteration, so K̃ = bf16(K) is a fixed SPD operator that CG
    solves to full f32 precision.  This mode keeps K̃ in bf16 (the storage rounding,
    ~2e-3 relative, becomes a smooth perturbation of the objective rather than a solver
    bias) and applies V exactly via a bf16 hi/lo split; for ≤ 64 real columns the
    ``[v_hi | v_lo]`` halves lane-pack into ONE 128-lane MXU pass — bf16-mode speed with
    high-mode convergence (measured v5e: 48 ms vs 67 ms per N=100k matvec at T=32).
    Like the other tight modes it forces HIGHEST-precision preconditioner arithmetic.
    Ignored when kernel_matvec_bf16 / _highest / _high is on."""
    _default = False


# alias for API parity with the reference
use_keops = use_pallas


# --------------------------------------------------------------------------------------------
# Frozen snapshot for solver entry points
# --------------------------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SolverConfig:
    cg_tolerance: float = 1.0
    max_cg_iterations: int = 1000
    max_cholesky_size: int = 800
    max_preconditioner_size: int = 15
    min_preconditioning_size: int = 2000
    num_trace_samples: int = 10
    max_lanczos_quadrature_iterations: int = 20
    max_root_decomposition_size: int = 100
    num_contour_quadrature: int = 15
    minres_tolerance: float = 1e-4
    max_minres_iterations: int = 100
    cholesky_jitter: float = 1e-6
    cholesky_max_tries: int = 3
    skip_logdet_forward: bool = False
    deterministic_probes: bool = False
    precond_logdet_vr: bool = False
    # preconditioner/matvec numerics — captured so custom-VJP backwards (traced outside
    # the caller's ``with`` contexts) rebuild P and run matvecs with the call-time flags
    preconditioner_noise_budget: float = 0.0
    preconditioner_highest_precision: bool = False
    use_pallas: bool = True
    kernel_matvec_bf16: bool = False
    kernel_matvec_highest: bool = False
    kernel_matvec_high: bool = False
    kernel_matvec_consistent_bf16: bool = False
    fast_precond_grad: bool = True
    mbcg_grad_bf16: bool = False


def snapshot(dtype=None) -> SolverConfig:
    """Capture the current trace-time settings as a hashable config."""
    return SolverConfig(
        cg_tolerance=float(cg_tolerance.value()),
        max_cg_iterations=int(max_cg_iterations.value()),
        max_cholesky_size=int(max_cholesky_size.value()),
        max_preconditioner_size=int(max_preconditioner_size.value()),
        min_preconditioning_size=int(min_preconditioning_size.value()),
        num_trace_samples=int(num_trace_samples.value()),
        max_lanczos_quadrature_iterations=int(max_lanczos_quadrature_iterations.value()),
        max_root_decomposition_size=int(max_root_decomposition_size.value()),
        num_contour_quadrature=int(num_contour_quadrature.value()),
        minres_tolerance=float(minres_tolerance.value()),
        max_minres_iterations=int(max_minres_iterations.value()),
        cholesky_jitter=float(cholesky_jitter.value(dtype)),
        cholesky_max_tries=int(cholesky_max_tries.value()),
        skip_logdet_forward=bool(skip_logdet_forward.on()),
        deterministic_probes=bool(deterministic_probes.on()),
        precond_logdet_vr=bool(precond_logdet_vr.on()),
        preconditioner_noise_budget=float(preconditioner_noise_budget.value()),
        preconditioner_highest_precision=bool(preconditioner_highest_precision.on()),
        use_pallas=bool(use_pallas.on()),
        kernel_matvec_bf16=bool(kernel_matvec_bf16.on()),
        kernel_matvec_highest=bool(kernel_matvec_highest.on()),
        kernel_matvec_high=bool(kernel_matvec_high.on()),
        kernel_matvec_consistent_bf16=bool(kernel_matvec_consistent_bf16.on()),
        fast_precond_grad=bool(fast_precond_grad.on()),
        mbcg_grad_bf16=bool(mbcg_grad_bf16.on()),
    )
