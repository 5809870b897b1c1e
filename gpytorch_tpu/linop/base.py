"""LinearOperator — lazy, structure-exploiting matrix algebra (TPU-native linear_operator).

This re-creates the numerical core the reference outsources to the ``linear_operator`` package
(see SURVEY.md §2.1): a lazy matrix abstraction where *all* inference is pulled through
``matmul``-based iterative methods (preconditioned CG / mBCG / Lanczos / SLQ), so scalable GP
variants reduce to defining a fast ``_matmul``.

Every operator is a registered pytree (arrays dynamic, metadata static) so operators compose
freely with ``jit`` / ``grad`` / ``vmap``.  Shapes are static; dynamic stopping inside solvers
uses ``lax.while_loop`` with convergence masking.

Dispatch policy (mirrors linear_operator):
  * ``solve`` / ``inv_quad_logdet`` use dense Cholesky when ``n <= settings.max_cholesky_size()``
    or fast_computations is off; otherwise preconditioned CG (mBCG) with SLQ log-dets.
  * ``root_decomposition`` uses Cholesky when small, Lanczos (LOVE) when large.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .. import settings
from ..core.pytree import DictPyTree, register_dynamic_base

Array = jax.Array


def _matmul_dtype(dtype):
    return jnp.float32 if dtype in (jnp.bfloat16, jnp.float16) else dtype


def probe_base_samples(key, shape, dtype):
    """Base i.i.d. draw for probe vectors: standard normal, or Rademacher (±1) under
    ``settings.rademacher_probes`` — same covariance (identity), strictly lower
    quadratic-form estimator variance (Avron & Toledo 2011).  Every probe site (mBCG
    stream, preconditioner-distributed samples) routes through here so the flag flips
    the whole estimator consistently."""
    if settings.rademacher_probes.on():
        return jax.random.rademacher(key, shape, dtype=dtype)
    return jax.random.normal(key, shape, dtype=dtype)


class LinearOperator(DictPyTree):
    """Abstract lazy matrix: subclasses define ``_matmul``, ``_shape``, ``_diagonal``,
    ``to_dense`` and inherit solve/logdet/root machinery.

    Reference surface: ``linear_operator.operators.LinearOperator`` as consumed by GPyTorch
    (gpytorch/__init__.py:34-283 functional API).
    """

    # ------------------------------------------------------------------ abstract
    def _matmul(self, rhs: Array) -> Array:
        """Matrix-matrix product with a dense rhs of shape (..., m, k)."""
        raise NotImplementedError

    def _shape(self) -> Tuple[int, ...]:
        raise NotImplementedError

    def to_dense(self) -> Array:
        n = self.shape[-1]
        eye = jnp.eye(n, dtype=self.dtype)
        eye = jnp.broadcast_to(eye, self.batch_shape + (n, n))
        return self._matmul(eye)

    def _diagonal(self) -> Array:
        return jnp.diagonal(self.to_dense(), axis1=-2, axis2=-1)

    def _transpose(self) -> "LinearOperator":
        return DenseLinearOperator(jnp.swapaxes(self.to_dense(), -1, -2))

    # ------------------------------------------------------------------ shape & dtype
    @property
    def shape(self) -> Tuple[int, ...]:
        return tuple(self._shape())

    @property
    def batch_shape(self) -> Tuple[int, ...]:
        return self.shape[:-2]

    @property
    def matrix_shape(self) -> Tuple[int, int]:
        return self.shape[-2:]

    @property
    def ndim(self) -> int:
        return len(self.shape)

    def size(self, dim: Optional[int] = None):
        return self.shape if dim is None else self.shape[dim]

    @property
    def is_square(self) -> bool:
        return self.shape[-1] == self.shape[-2]

    @property
    def dtype(self):
        leaves = jax.tree_util.tree_leaves(self)
        return leaves[0].dtype if leaves else jnp.float32

    def numel(self) -> int:
        return int(np.prod(self.shape))

    # ------------------------------------------------------------------ matmul API
    def matmul(self, rhs):
        if isinstance(rhs, LinearOperator):
            from .composition import MatmulLinearOperator

            return MatmulLinearOperator(self, rhs)
        rhs = jnp.asarray(rhs)
        if rhs.ndim == 1:
            return self._matmul(rhs[..., None])[..., 0]
        return self._matmul(rhs)

    def __matmul__(self, rhs):
        return self.matmul(rhs)

    def rmatmul(self, lhs):
        """lhs @ self for dense lhs."""
        lhs = jnp.asarray(lhs)
        if lhs.ndim == 1:
            return self._t_matmul(lhs[..., None, :].swapaxes(-1, -2))[..., 0]
        return jnp.swapaxes(self._t_matmul(jnp.swapaxes(lhs, -1, -2)), -1, -2)

    def _t_matmul(self, rhs: Array) -> Array:
        """Transpose matmul: self.T @ rhs.  Default via _transpose."""
        return self._transpose()._matmul(rhs)

    @property
    def mT(self) -> "LinearOperator":
        return self._transpose()

    @property
    def T(self) -> "LinearOperator":
        return self._transpose()

    def transpose(self, dim0: int = -2, dim1: int = -1) -> "LinearOperator":
        d = {dim0 % self.ndim, dim1 % self.ndim}
        if d == {self.ndim - 2, self.ndim - 1}:
            return self._transpose()
        raise NotImplementedError("Only final-two-dim transpose is supported on operators")

    def diagonal(self) -> Array:
        return self._diagonal()

    # ------------------------------------------------------------------ arithmetic
    def __add__(self, other):
        from .composition import SumLinearOperator
        from .diag import DiagLinearOperator
        from .zero import ZeroLinearOperator

        if isinstance(other, ZeroLinearOperator):
            return self
        if isinstance(other, DiagLinearOperator):
            return self.add_diagonal(other._diag_values())
        if isinstance(other, LinearOperator):
            return SumLinearOperator(self, other)
        other = jnp.asarray(other)
        return SumLinearOperator(self, DenseLinearOperator(other))

    def __radd__(self, other):
        return self.__add__(other)

    def __sub__(self, other):
        return self.__add__(other * -1)

    def __neg__(self):
        return self * -1

    def __mul__(self, other):
        from .composition import ConstantMulLinearOperator

        if isinstance(other, LinearOperator):
            from .dense_ops import hadamard_product

            return hadamard_product(self, other)
        other = jnp.asarray(other)
        if other.ndim > 0 and other.shape[-1] != 1:
            from .dense_ops import hadamard_product

            return hadamard_product(self, DenseLinearOperator(jnp.broadcast_to(other, self.shape)))
        return ConstantMulLinearOperator(self, other)

    def __rmul__(self, other):
        return self.__mul__(other)

    def __truediv__(self, other):
        return self.__mul__(1.0 / other)

    def add_diagonal(self, diag) -> "LinearOperator":
        """self + diag_embed(diag) (reference: gpytorch/__init__.py:34 add_diagonal)."""
        from .added_diag import AddedDiagLinearOperator
        from .diag import ConstantDiagLinearOperator, DiagLinearOperator

        if not self.is_square:
            raise RuntimeError("add_diagonal only defined for square operators")
        diag = jnp.asarray(diag, dtype=self.dtype)
        n = self.shape[-1]
        if diag.ndim == 0:
            diag_op = ConstantDiagLinearOperator(diag[None], n)
        elif diag.shape[-1] == 1:
            diag_op = ConstantDiagLinearOperator(diag, n)
        else:
            diag_op = DiagLinearOperator(jnp.broadcast_to(diag, jnp.broadcast_shapes(diag.shape, (n,))))
        return AddedDiagLinearOperator(self, diag_op)

    def add_jitter(self, jitter_val: float = 1e-3) -> "LinearOperator":
        return self.add_diagonal(jnp.asarray(jitter_val, dtype=self.dtype))

    def mul(self, other):
        return self.__mul__(other)

    # ------------------------------------------------------------------ structure hooks
    def evaluate_kernel(self) -> "LinearOperator":
        """Hook for LazyEvaluatedKernelOperator; identity elsewhere."""
        return self

    def _get_rows(self, idx: Array) -> Array:
        """Dense rows self[..., idx, :] — used by pivoted-Cholesky preconditioning.

        ``idx`` has shape ``batch_shape + (m,)`` (per-batch row indices); returns
        ``batch_shape + (m, n)``.
        """
        dense = self.to_dense()
        idx = jnp.broadcast_to(idx, self.batch_shape + idx.shape[-1:])
        return jnp.take_along_axis(dense, idx[..., :, None], axis=-2)

    def _preconditioner(self):
        """Return (apply_fn, precond_root_linop, precond_logdet) or (None, None, None)."""
        return None, None, None

    def _is_known_psd(self) -> bool:
        """True when the operator is positive semi-definite *by construction* (R Rᵀ roots,
        kernel matrices, identity/zero).  Consulted where a bound is only valid for a PSD
        operand — e.g. ``AddedDiagLinearOperator._eig_lower_bound``'s Weyl argument.
        Default ``False``: unknown symmetric operators must not be assumed PSD."""
        return False

    def _eig_lower_bound(self) -> Optional[Array]:
        """A known lower bound on the operator's eigenvalues (or ``None`` if unknown).

        Used by the Lanczos/Rayleigh–Ritz root decompositions to floor the Ritz values:
        at N=100k with ‖K̂‖ ~ 1e4–1e5, f32 Rayleigh–Ritz noise (~matvec_err · λ_max) is
        larger than the true λ_min = σ² (~1e-2), so the smallest Ritz values of
        T = QᵀK̂Q are pure rounding noise — tiny or negative.  In the INVERSE root these
        become 1/√λ spikes of ~1e4 that make LOVE predictive variances go negative
        (measured on-chip: marginal NLPD 5020 vs −0.2 at near-identical hypers).  An
        operator that knows its spectrum's floor (K + σ²I ⇒ σ²) declares it here and the
        Ritz values are clamped to it — the exact-arithmetic Cauchy-interlacing bound.
        Shape: scalar or (*batch,), broadcastable against the Ritz values' batch shape.
        """
        return None

    #: Mesh-axis name when this operator's rows are sharded over a device mesh (set by
    #: distributed.ShardedKernelLinearOperator); None for single-device operators.
    shard_axis_name = None

    def _use_cholesky(self) -> bool:
        if self.shard_axis_name is not None:
            return False  # sharded operators only exist as collective matvecs
        n = self.shape[-1]
        return (
            n <= settings.max_cholesky_size.value()
            or not settings.fast_computations.solves.on()
            or settings.trace_mode.on()
        )

    def detach(self) -> "LinearOperator":
        return jax.tree_util.tree_map(jax.lax.stop_gradient, self)

    def _is_traced(self, *extra) -> bool:
        """True when this operator (or any ``extra`` array) contains jit tracers —
        eager-only behaviors (host syncs, chunked dispatch) must be skipped then."""
        leaves = jax.tree_util.tree_leaves(self) + list(extra)
        return any(isinstance(leaf, jax.core.Tracer) for leaf in leaves)

    # ------------------------------------------------------------------ factorizations
    def cholesky(self, upper: bool = False) -> "LinearOperator":
        from .triangular import TriangularLinearOperator
        from ..solvers.cholesky import psd_safe_cholesky

        L = psd_safe_cholesky(self.to_dense())
        if upper:
            return TriangularLinearOperator(jnp.swapaxes(L, -1, -2), upper=True)
        return TriangularLinearOperator(L, upper=False)

    def root_decomposition(self, method: Optional[str] = None) -> "LinearOperator":
        """Return RootLinearOperator R with R Rᵀ ≈ self (LOVE cache; reference
        gpytorch/__init__.py:176)."""
        from .root import RootLinearOperator
        from ..solvers.lanczos import lanczos_root

        n = self.shape[-1]
        if method is None:
            if self._use_cholesky() or not settings.fast_computations.covar_root_decomposition.on():
                method = "cholesky"
            else:
                method = "lanczos"
        if method == "cholesky":
            return RootLinearOperator(self.cholesky().to_dense())
        max_rank = min(n, settings.max_root_decomposition_size.value())
        root = lanczos_root(self, max_rank)
        return RootLinearOperator(root)

    def root_inv_decomposition(
        self, initial_vectors: Optional[Array] = None, test_vectors: Optional[Array] = None, method: Optional[str] = None
    ) -> "LinearOperator":
        """Return RootLinearOperator R with R Rᵀ ≈ self⁻¹ (reference gpytorch/__init__.py:200)."""
        from .root import RootLinearOperator
        from ..solvers.lanczos import lanczos_inv_root

        n = self.shape[-1]
        if method is None:
            if self._use_cholesky() or not settings.fast_computations.covar_root_decomposition.on():
                method = "cholesky"
            else:
                method = "lanczos"
        if method == "cholesky":
            L = self.cholesky().to_dense()
            eye = jnp.broadcast_to(jnp.eye(n, dtype=L.dtype), L.shape)
            Linv = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
            return RootLinearOperator(jnp.swapaxes(Linv, -1, -2))
        max_rank = min(n, settings.max_root_decomposition_size.value())
        root = lanczos_inv_root(self, max_rank, initial_vectors=initial_vectors)
        return RootLinearOperator(root)

    # ------------------------------------------------------------------ solves
    def solve(self, rhs, lhs: Optional[Array] = None) -> Array:
        """self⁻¹ @ rhs (optionally lhs @ self⁻¹ @ rhs); reference gpytorch/__init__.py:220."""
        squeeze = False
        rhs = jnp.asarray(rhs)
        if rhs.ndim == 1:
            rhs, squeeze = rhs[:, None], True
        if self._use_cholesky():
            from ..solvers.cholesky import psd_safe_cholesky

            L = psd_safe_cholesky(self.to_dense())
            res = jax.scipy.linalg.cho_solve((L, True), rhs)
        else:
            from ..solvers.cg import linear_solve_cg

            op = self.evaluate_kernel()
            chunk = int(settings.solve_column_chunk.value())
            if chunk and rhs.shape[-1] > chunk and not self._is_traced(rhs):
                # Eager wide solve: chunk the columns into separate CG dispatches with a
                # host sync between them, so no single device program runs unboundedly
                # long (see settings.solve_column_chunk).  CG is column-independent, so
                # the concatenated solution equals the one-shot solve to tolerance.
                pieces = []
                for i in range(0, rhs.shape[-1], chunk):
                    piece = linear_solve_cg(op, rhs[..., i : i + chunk])
                    jax.block_until_ready(piece)
                    pieces.append(piece)
                res = jnp.concatenate(pieces, axis=-1)
            else:
                res = linear_solve_cg(op, rhs)
        if lhs is not None:
            res = lhs @ res
        return res[..., 0] if squeeze else res

    def inv_quad(self, rhs, reduce_inv_quad: bool = True) -> Array:
        iq, _ = self.inv_quad_logdet(inv_quad_rhs=rhs, logdet=False, reduce_inv_quad=reduce_inv_quad)
        return iq

    def inv_quad_logdet(
        self,
        inv_quad_rhs: Optional[Array] = None,
        logdet: bool = False,
        reduce_inv_quad: bool = True,
        key: Optional[Array] = None,
        config=None,
        solver_state: Optional[Array] = None,
        return_state: bool = False,
    ) -> Tuple[Optional[Array], Optional[Array]]:
        """Compute (rhsᵀ self⁻¹ rhs, log|self|) in one pass — the BBMM hot path.

        Reference: gpytorch/__init__.py:118 (delegating to linear_operator's mBCG+SLQ).
        Small matrices / fast-computations-off: dense Cholesky.  Large: mBCG with
        pivoted-Cholesky preconditioning and stochastic Lanczos quadrature.

        ``solver_state``/``return_state``: warm-started mBCG solves across optimizer steps
        (see solvers/inv_quad.py docstring) — only meaningful on the iterative path; the
        Cholesky path returns a zero-size state untouched.
        """
        if self._use_cholesky() or not settings.fast_computations.log_prob.on():
            from ..solvers.cholesky import psd_safe_cholesky

            L = psd_safe_cholesky(self.to_dense())
            logdet_term = None
            if logdet:
                logdet_term = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
            iq_term = None
            if inv_quad_rhs is not None:
                rhs = inv_quad_rhs if inv_quad_rhs.ndim > 1 else inv_quad_rhs[:, None]
                from .triangular import _bcast_solve_triangular

                Linv_rhs = _bcast_solve_triangular(L, rhs, lower=True)
                iq_term = jnp.sum(Linv_rhs * Linv_rhs, axis=-2)
                if reduce_inv_quad:
                    iq_term = jnp.sum(iq_term, axis=-1)
            if return_state:
                return (iq_term, logdet_term), solver_state
            return iq_term, logdet_term
        from ..solvers.inv_quad import inv_quad_logdet_mbcg

        return inv_quad_logdet_mbcg(
            self.evaluate_kernel(), inv_quad_rhs, logdet=logdet, reduce_inv_quad=reduce_inv_quad,
            key=key, config=config, solver_state=solver_state, return_state=return_state,
        )

    def logdet(self) -> Array:
        _, ld = self.inv_quad_logdet(logdet=True)
        return ld

    def sqrt_inv_matmul(self, rhs, lhs: Optional[Array] = None):
        """self^{-1/2} @ rhs via contour-integral quadrature (reference gpytorch/__init__.py:252)."""
        from ..solvers.contour import sqrt_inv_matmul as _sqrt_inv_matmul

        return _sqrt_inv_matmul(self, rhs, lhs)

    # ------------------------------------------------------------------ sampling
    def zero_mean_mvn_samples(self, key: Array, num_samples: int) -> Array:
        """Draw N(0, self) samples of shape (num_samples, *batch, n).

        With ``settings.ciq_samples`` on, samples are drawn as K^{1/2}ε via
        contour-integral quadrature (msMINRES) instead of a Lanczos root decomposition —
        the reference linear_operator's CIQ sampling path (settings.py:472), preferred
        when a low-rank root truncates the spectrum too aggressively.
        """
        n = self.shape[-1]
        if settings.ciq_samples.on():
            from ..solvers.contour import contour_integral_quad

            base = jax.random.normal(key, self.batch_shape + (n, num_samples), dtype=self.dtype)
            samples = contour_integral_quad(self, base, inverse=False)  # K^{1/2} ε
            return jnp.moveaxis(samples, -1, 0)
        root = self.root_decomposition().root
        k = root.shape[-1]
        base = jax.random.normal(key, (num_samples,) + self.batch_shape + (k, 1), dtype=self.dtype)
        return (root @ base)[..., 0]

    # ------------------------------------------------------------------ indexing
    def __getitem__(self, index) -> "LinearOperator":
        return DenseLinearOperator(self.to_dense()[index])

    def expand(self, *sizes) -> "LinearOperator":
        if len(sizes) == 1 and isinstance(sizes[0], (tuple, list)):
            sizes = tuple(sizes[0])
        from .composition import BatchRepeatLinearOperator

        batch = tuple(int(s) for s in sizes[: len(sizes) - 2]) if len(sizes) >= 2 else tuple(sizes)
        if len(sizes) >= 2 and tuple(sizes[-2:]) != self.matrix_shape:
            raise RuntimeError("expand cannot change matrix dims")
        return BatchRepeatLinearOperator(self, batch) if batch else self

    def repeat(self, *sizes) -> "LinearOperator":
        return self.expand(*sizes)

    def __repr__(self):
        try:
            return f"{type(self).__name__}(shape={self.shape})"
        except Exception:
            return f"{type(self).__name__}(<unmaterialized>)"


class DenseLinearOperator(LinearOperator):
    """Wraps a dense array (reference: linear_operator DenseLinearOperator).

    Matvecs use Precision.HIGHEST: CG convergence and SLQ accuracy degrade badly under the
    TPU default one-pass-bf16 matmul rounding, and the K·v products are the numerical core.
    """

    def __init__(self, array):
        self.array = jnp.asarray(array)
        if self.array.ndim < 2:
            raise ValueError("DenseLinearOperator requires ndim >= 2")

    def _matmul(self, rhs):
        return jnp.matmul(self.array, rhs, precision=jax.lax.Precision.HIGHEST)

    def _t_matmul(self, rhs):
        return jnp.matmul(jnp.swapaxes(self.array, -1, -2), rhs, precision=jax.lax.Precision.HIGHEST)

    def _shape(self):
        return self.array.shape

    def _diagonal(self):
        return jnp.diagonal(self.array, axis1=-2, axis2=-1)

    def _transpose(self):
        return DenseLinearOperator(jnp.swapaxes(self.array, -1, -2))

    def to_dense(self):
        return self.array

    def _get_rows(self, idx):
        idx = jnp.broadcast_to(idx, self.array.shape[:-2] + idx.shape[-1:])
        return jnp.take_along_axis(self.array, idx[..., :, None], axis=-2)

    def __getitem__(self, index):
        return DenseLinearOperator(self.array[index])

    def __add__(self, other):
        if isinstance(other, DenseLinearOperator):
            return DenseLinearOperator(self.array + other.array)
        return super().__add__(other)


def to_linear_operator(obj) -> LinearOperator:
    if isinstance(obj, LinearOperator):
        return obj
    return DenseLinearOperator(jnp.asarray(obj))


def to_dense(obj) -> Array:
    if isinstance(obj, LinearOperator):
        return obj.to_dense()
    return jnp.asarray(obj)


register_dynamic_base(LinearOperator)
