"""MultivariateNormal backed by a lazy covariance operator.

Reference: gpytorch/distributions/multivariate_normal.py:22 — ``log_prob`` (:221) pulls
``inv_quad_logdet`` through the operator (:249), ``rsample`` uses a root decomposition
(:254-320), ``variance`` is the lazy diagonal with ``min_variance`` clamping (:362).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .. import settings
from ..core.pytree import DictPyTree
from ..linop import DenseLinearOperator, LinearOperator, to_linear_operator
from .distribution import Distribution


class MultivariateNormal(Distribution):
    def __init__(self, mean, covariance_matrix, validate_args: bool = False):
        self.loc = jnp.asarray(mean) if not isinstance(mean, jax.Array) else mean
        self._covar = to_linear_operator(covariance_matrix)
        if validate_args and settings.debug.on():
            if self.loc.shape[-1] != self._covar.shape[-1]:
                raise ValueError("mean/covariance size mismatch")

    # -- basic properties ------------------------------------------------------------------
    @property
    def islazy(self) -> bool:
        return True

    @property
    def mean(self) -> jax.Array:
        return jnp.broadcast_to(self.loc, self.batch_shape + self.event_shape)

    @property
    def lazy_covariance_matrix(self) -> LinearOperator:
        return self._covar

    @property
    def covariance_matrix(self) -> jax.Array:
        return self._covar.to_dense()

    @property
    def variance(self) -> jax.Array:
        diag = self._covar._diagonal()
        diag = jnp.broadcast_to(diag, self.batch_shape + self.event_shape)
        min_var = settings.min_variance.value(diag.dtype)
        return jnp.where(diag < min_var, jnp.full_like(diag, min_var), diag)

    @property
    def stddev(self) -> jax.Array:
        return jnp.sqrt(self.variance)

    @property
    def batch_shape(self) -> Tuple[int, ...]:
        return tuple(jnp.broadcast_shapes(self.loc.shape[:-1], self._covar.batch_shape))

    @property
    def event_shape(self) -> Tuple[int, ...]:
        return (self.loc.shape[-1],)

    @property
    def dtype(self):
        return self.loc.dtype

    # -- densities ---------------------------------------------------------------------------
    def log_prob(self, value: jax.Array, key: Optional[jax.Array] = None, solver_config=None,
                 solver_state=None, return_state: bool = False) -> jax.Array:
        """Reference: multivariate_normal.py:221-252 → one inv_quad_logdet call (mBCG).

        ``key`` seeds the SLQ probe vectors; pass a fresh key per optimizer step inside a
        jitted training loop (otherwise probes are frozen at trace time).
        ``solver_config``: explicit hashable settings.SolverConfig overriding the ambient
        context settings for the solver knobs (jit-safe side channel).
        ``solver_state``/``return_state``: warm-started mBCG solves across optimizer steps
        (solvers/inv_quad.py) — with ``return_state`` the return is ``(log_prob, state)``.
        """
        if settings.fast_computations.log_prob.off():
            lp = self._log_prob_cholesky(value)
            return (lp, solver_state) if return_state else lp
        diff = value - self.loc
        covar = self._covar.evaluate_kernel()
        if diff.shape[:-1] != self.batch_shape:
            # broadcast sample dims: fold extra dims into columns where possible
            target = jnp.broadcast_shapes(diff.shape[:-1], self.batch_shape)
            diff = jnp.broadcast_to(diff, target + diff.shape[-1:])
        res = covar.inv_quad_logdet(
            inv_quad_rhs=diff[..., None], logdet=True, key=key, config=solver_config,
            solver_state=solver_state, return_state=return_state,
        )
        (inv_quad, logdet), state = res if return_state else (res, None)
        # Use the covariance's (global) size rather than the local event shape: under a
        # row-sharded operator the loc holds only this device's block while the operator
        # reports the global N (distributed/sharded.py).
        n = covar.shape[-1]
        lp = -0.5 * (inv_quad + logdet + n * math.log(2 * math.pi))
        return (lp, state) if return_state else lp

    def _log_prob_cholesky(self, value):
        diff = value - self.loc
        from ..solvers.cholesky import psd_safe_cholesky

        L = psd_safe_cholesky(self._covar.to_dense())
        tri = jax.scipy.linalg.solve_triangular(L, diff[..., None], lower=True)[..., 0]
        n = self.event_shape[0]
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
        return -0.5 * (jnp.sum(tri * tri, axis=-1) + logdet + n * math.log(2 * math.pi))

    # -- sampling ----------------------------------------------------------------------------
    def rsample(self, key: jax.Array, sample_shape: Tuple[int, ...] = ()) -> jax.Array:
        num = 1
        for s in sample_shape:
            num *= s
        covar = self._covar.evaluate_kernel()
        samples = covar.zero_mean_mvn_samples(key, num)  # (num, *batch, n)
        samples = samples + self.mean
        return samples.reshape(tuple(sample_shape) + self.batch_shape + self.event_shape)

    def sample(self, key: jax.Array, sample_shape: Tuple[int, ...] = ()) -> jax.Array:
        return jax.lax.stop_gradient(self.rsample(key, sample_shape))

    def get_base_samples(self, key, sample_shape=()):
        num = 1
        for s in sample_shape:
            num *= s
        root = self._covar.evaluate_kernel().root_decomposition().root
        k = root.shape[-1]
        return jax.random.normal(key, tuple(sample_shape) + self.batch_shape + (k,), dtype=self.dtype)

    def rsample_from_base_samples(self, base_samples):
        root = self._covar.evaluate_kernel().root_decomposition().root
        return (root @ base_samples[..., None])[..., 0] + self.mean

    # -- transformations -----------------------------------------------------------------------
    def add_jitter(self, noise: float = 1e-4) -> "MultivariateNormal":
        return MultivariateNormal(self.loc, self._covar.add_jitter(noise))

    def expand(self, batch_shape) -> "MultivariateNormal":
        batch_shape = tuple(batch_shape)
        new_loc = jnp.broadcast_to(self.loc, batch_shape + self.event_shape)
        new_covar = self._covar.expand(batch_shape + self._covar.matrix_shape)
        return MultivariateNormal(new_loc, new_covar)

    def __getitem__(self, index) -> "MultivariateNormal":
        """Reference: multivariate_normal.py:395 — index batch dims and/or the event dim."""
        if not isinstance(index, tuple):
            index = (index,)
        ndim_batch = len(self.batch_shape)
        # expand ellipsis
        if any(ix is Ellipsis for ix in index):
            pos = index.index(Ellipsis)
            fill = (1 + ndim_batch) - (len(index) - 1)
            index = index[:pos] + (slice(None),) * fill + index[pos + 1 :]
        if len(index) <= ndim_batch:
            mean = self.mean[index]
            covar = DenseLinearOperator(self.covariance_matrix[index])
            return MultivariateNormal(mean, covar)
        *batch_ix, event_ix = index
        batch_ix = tuple(batch_ix)
        mean = self.mean[batch_ix + (event_ix,)]
        cov = self.covariance_matrix[batch_ix + (event_ix, slice(None))][..., :, event_ix]
        if mean.ndim == cov.ndim - 1 and cov.shape[-1] == cov.shape[-2]:
            return MultivariateNormal(mean, DenseLinearOperator(cov))
        from .normal import Normal

        return Normal(mean, jnp.sqrt(cov))

    def to_data_independent_dist(self):
        from .normal import Normal

        return Normal(self.mean, self.stddev)

    # -- info measures ----------------------------------------------------------------------------
    def entropy(self) -> jax.Array:
        n = self.event_shape[0]
        logdet = self._covar.evaluate_kernel().logdet()
        return 0.5 * (n * (1.0 + math.log(2 * math.pi)) + logdet)

    def confidence_region(self) -> Tuple[jax.Array, jax.Array]:
        std2 = 2.0 * self.stddev
        return self.mean - std2, self.mean + std2

    def __add__(self, other):
        if isinstance(other, MultivariateNormal):
            return MultivariateNormal(self.loc + other.loc, self._covar + other._covar)
        return MultivariateNormal(self.loc + other, self._covar)

    def __mul__(self, other):
        return MultivariateNormal(self.loc * other, self._covar * (other**2))

    def __truediv__(self, other):
        return self.__mul__(1.0 / other)

    def __repr__(self):
        return f"MultivariateNormal(batch={self.batch_shape}, event={self.event_shape})"


def kl_divergence(p: MultivariateNormal, q: MultivariateNormal) -> jax.Array:
    """KL(p ‖ q) for lazy MVNs (reference: registered KL at multivariate_normal.py:453).

    KL = ½[ tr(Σq⁻¹Σp) + (μq−μp)ᵀ Σq⁻¹ (μq−μp) − n + log|Σq| − log|Σp| ]
    """
    n = p.event_shape[0]
    mean_diff = q.mean - p.mean
    q_covar = q.lazy_covariance_matrix.evaluate_kernel()
    p_covar = p.lazy_covariance_matrix.evaluate_kernel()
    root_p = p_covar.root_decomposition().root.to_dense()
    rhs = jnp.concatenate([root_p, mean_diff[..., None]], axis=-1)
    inv_quad, logdet_q = q_covar.inv_quad_logdet(inv_quad_rhs=rhs, logdet=True, reduce_inv_quad=True)
    logdet_p = p_covar.logdet()
    return 0.5 * (inv_quad - n + logdet_q - logdet_p)
