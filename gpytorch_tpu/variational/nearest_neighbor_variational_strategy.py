"""VNNGP — variational nearest-neighbor GP (reference:
gpytorch/variational/nearest_neighbor_variational_strategy.py:24; Wu et al. 2022,
arXiv 2202.01694).

All observed inputs are inducing points; q(u) = Π_j q(u_j | u_{n(j)}) with n(j) the k
nearest *preceding* inducing points, so the ELBO factorizes over both inducing points and
observations: after the one-time k-NN build, every term is an O(k³) solve, batched over
the minibatch — a single (b, k, k) Cholesky on the MXU.

JAX design differences from the reference:
  * no hidden training-iterator state — training calls pass explicit minibatch ``indices``
    (positions of the batch inputs within the inducing set); with none given the full set
    is used;
  * the stochastic KL estimator takes explicit ``kl_indices`` (sampled from [k, M)):
    KL ≈ KL_first_k + (M−k)/|B| Σ_{j∈B} KL_j — unbiased, vs the reference's iterator
    scheme (:339-465);
  * eval-mode prediction batches the per-test-point k-neighbor solve with one batched
    Cholesky instead of permuting through the unwhitened strategy.

Only MeanFieldVariationalDistribution is supported (matching the reference) and inducing
points are unbatched.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..distributions import MultivariateNormal
from ..linop import DiagLinearOperator
from ..solvers.cholesky import psd_safe_cholesky
from ..utils.nearest_neighbors import NNUtil
from ._variational_distribution import MeanFieldVariationalDistribution
from ._variational_strategy import _VariationalStrategy


class NNVariationalStrategy(_VariationalStrategy):
    def __init__(self, model, inducing_points, variational_distribution, k: int,
                 training_batch_size: Optional[int] = None, jitter_val: float = 1e-3,
                 compute_full_kl: bool = False, preferred_nnlib: str = "exact"):
        if not isinstance(variational_distribution, MeanFieldVariationalDistribution):
            raise RuntimeError("NNVariationalStrategy only supports MeanFieldVariationalDistribution")
        inducing_points = jnp.asarray(inducing_points)
        if inducing_points.ndim == 1:
            inducing_points = inducing_points[:, None]
        if inducing_points.ndim != 2:
            raise NotImplementedError("NNVariationalStrategy supports unbatched inducing points")
        super().__init__(model, inducing_points, variational_distribution,
                         learn_inducing_locations=False, jitter_val=jitter_val)
        self.M, self.D = inducing_points.shape
        self.k = int(k)
        if self.k >= self.M:
            raise ValueError(f"k must be smaller than the number of inducing points ({self.M}), got {k}")
        self.compute_full_kl = bool(compute_full_kl)
        self.training_batch_size = int(training_batch_size) if training_batch_size else self.M

        # preferred_nnlib mirrors the reference's faiss preference at scale
        # (gpytorch/utils/nearest_neighbors.py:35): "exact" = brute-force MXU top-k,
        # "ivf" = the approximate inverted-file index (use for M ≳ 10⁴ — both the
        # per-call queries and the one-time sequential build drop from O(M²) to
        # O(M · nprobe · M/C))
        if preferred_nnlib == "ivf":
            from ..utils.nearest_neighbors import IVFNNUtil

            self.nn_util = IVFNNUtil(self.k, dim=self.D)
        elif preferred_nnlib == "exact":
            self.nn_util = NNUtil(self.k, dim=self.D)
        else:
            raise ValueError(f"preferred_nnlib must be 'exact' or 'ivf', got {preferred_nnlib!r}")
        self.nn_util.set_nn_idx(inducing_points)
        # sequential k-NN structure among inducing points (one-time host cost)
        self.nn_xinduce_idx = self.nn_util.build_sequential_nn_idx(inducing_points)  # (M−k, k)

    # -- q(u)/p(u) ---------------------------------------------------------------------------
    def prior_distribution(self, model=None) -> MultivariateNormal:
        model = self._resolve_model(model)
        out = model.forward(self.inducing_points)
        return MultivariateNormal(out.loc, out.lazy_covariance_matrix.evaluate_kernel().add_jitter(self.jitter_val))

    def _maybe_initialize(self, model):
        if int(self.variational_params_initialized) == 0:
            prior = self.prior_distribution(model)
            vd = self._variational_distribution
            vd.initialize_variational_distribution(prior)
            # small initial stddev for faster KL convergence (reference :172-174)
            vd.raw_variational_stddev = jnp.full_like(vd.raw_variational_stddev, 1e-2)
            self.variational_params_initialized = jnp.ones((), dtype=jnp.int32)

    # -- call/forward --------------------------------------------------------------------------
    def __call__(self, x, prior: bool = False, model=None, indices=None, **kwargs):
        model = self._resolve_model(model)
        if prior:
            return model.forward(x)
        self._maybe_initialize(model)
        vd = self._variational_distribution
        if self.training:
            # training: q(f_i) = q(u_{idx(i)}) — inducing points ARE the observations
            if indices is None:
                if x is not None and x.shape[-2] != self.M:
                    indices = self.nn_util.find_nn_idx(x, k=1)[..., 0]
                else:
                    indices = jnp.arange(self.M)
            mean = vd.variational_mean[..., indices]
            var = vd.variational_stddev[..., indices] ** 2
            return MultivariateNormal(mean, DiagLinearOperator(var))
        return self._predict(jnp.asarray(x), model)

    def _predict(self, x, model) -> MultivariateNormal:
        """Eval mode: p(f*|u_{n(*)}) with per-point k-neighbor conditioning (reference :232-289)."""
        if x.ndim == 1:
            x = x[:, None]
        vd = self._variational_distribution
        nn_idx = self.nn_util.find_nn_idx(x)  # (n, k)
        Z_nn = self.inducing_points[nn_idx]  # (n, k, D)
        m_nn = vd.variational_mean[nn_idx]  # (n, k)
        s_nn = vd.variational_stddev[nn_idx] ** 2  # (n, k)

        # batched prior over [nn, x_i] per test point
        full_inputs = jnp.concatenate([Z_nn, x[:, None, :]], axis=-2)  # (n, k+1, D)
        full_output = model.forward(full_inputs)
        full_mean = full_output.loc  # (n, k+1)
        full_covar = full_output.lazy_covariance_matrix.to_dense()  # (n, k+1, k+1)

        mu_nn = full_mean[..., : self.k]
        mu_x = full_mean[..., self.k]
        K_nn = full_covar[..., : self.k, : self.k] + self.jitter_val * jnp.eye(self.k, dtype=x.dtype)
        k_nx = full_covar[..., : self.k, self.k]
        k_xx = full_covar[..., self.k, self.k]

        L = psd_safe_cholesky(K_nn)
        interp = jax.scipy.linalg.cho_solve((L, True), k_nx[..., None])[..., 0]  # K_nn⁻¹ k_nx, (n, k)
        pred_mean = mu_x + jnp.sum(interp * (m_nn - mu_nn), axis=-1)
        pred_var = (
            k_xx
            - jnp.sum(interp * k_nx, axis=-1)
            + jnp.sum(interp**2 * s_nn, axis=-1)
        )
        pred_var = jnp.maximum(pred_var, 1e-10)
        return MultivariateNormal(pred_mean, DiagLinearOperator(pred_var))

    # -- KL ----------------------------------------------------------------------------------
    def _firstk_kl_helper(self, model) -> jax.Array:
        """Exact KL over the first k inducing points (reference :321-337)."""
        Z = self.inducing_points[: self.k]
        out = model.forward(Z)
        prior = MultivariateNormal(out.loc, out.lazy_covariance_matrix.evaluate_kernel().add_jitter(self.jitter_val))
        vd = self._variational_distribution
        q = MultivariateNormal(
            vd.variational_mean[..., : self.k],
            DiagLinearOperator(vd.variational_stddev[..., : self.k] ** 2),
        )
        from ..distributions import kl_divergence

        return kl_divergence(q, prior)

    def _stochastic_kl_helper(self, kl_indices, model) -> jax.Array:
        """Σ_{j∈B} KL[q(u_j|u_{n(j)}) ‖ p(u_j|u_{n(j)})] for j ≥ k (reference :339-440).

        Per the paper's factorization each term is
          ½[ log F_j − log σ²_j − 1 + (Σ_l B_{jl}² s_{n(j)l} + σ²_j)/F_j
             + (m_j − μ_j − B_jᵀ(m_{n(j)} − μ_{n(j)}))²/F_j ]
        with B_j = K_{n(j)n(j)}⁻¹ k_{n(j)j} and F_j = k_jj − k_{jn(j)} B_j.
        """
        vd = self._variational_distribution
        kl_indices = jnp.asarray(kl_indices)
        b = kl_indices.shape[0]

        Z_j = self.inducing_points[kl_indices]  # (b, D)
        nn_idx = self.nn_xinduce_idx[kl_indices - self.k]  # (b, k)
        Z_nn = self.inducing_points[nn_idx]  # (b, k, D)

        full_inputs = jnp.concatenate([Z_nn, Z_j[:, None, :]], axis=-2)  # (b, k+1, D)
        full_output = model.forward(full_inputs)
        full_mean = full_output.loc
        full_covar = full_output.lazy_covariance_matrix.to_dense()

        mu_nn = full_mean[..., : self.k]
        mu_j = full_mean[..., self.k]
        K_nn = full_covar[..., : self.k, : self.k] + self.jitter_val * jnp.eye(self.k, dtype=Z_j.dtype)
        k_nj = full_covar[..., : self.k, self.k]
        k_jj = full_covar[..., self.k, self.k]

        L = psd_safe_cholesky(K_nn)
        B = jax.scipy.linalg.cho_solve((L, True), k_nj[..., None])[..., 0]  # (b, k)
        F = k_jj - jnp.sum(B * k_nj, axis=-1) + self.jitter_val  # (b,)

        s_j = vd.variational_stddev[..., kl_indices] ** 2
        m_j = vd.variational_mean[..., kl_indices]
        s_nn = vd.variational_stddev[..., nn_idx] ** 2  # (b, k)
        m_nn = vd.variational_mean[..., nn_idx]

        logdet_p = jnp.log(F)
        logdet_q = jnp.log(s_j)
        trace = (jnp.sum(B**2 * s_nn, axis=-1) + s_j) / F
        mean_term = (m_j - mu_j - jnp.sum(B * (m_nn - mu_nn), axis=-1)) ** 2 / F
        return 0.5 * jnp.sum(logdet_p - logdet_q - 1.0 + trace + mean_term, axis=-1)

    def kl_divergence(self, model=None, kl_indices=None) -> jax.Array:
        model = self._resolve_model(model)
        if kl_indices is not None:
            frac = (self.M - self.k) / kl_indices.shape[0]
            return self._firstk_kl_helper(model) + frac * self._stochastic_kl_helper(kl_indices, model)
        # full KL (default; reference compute_full_kl path :443-449)
        kl = self._firstk_kl_helper(model)
        if self.M > self.k:
            kl = kl + self._stochastic_kl_helper(jnp.arange(self.k, self.M), model)
        return kl

    def get_fantasy_model(self, inputs, targets, **kwargs):
        raise NotImplementedError("No fantasy model support for NNVariationalStrategy (matches reference)")
