"""Online GP serving with constant-time fantasy updates (rank-m Schur + WISKI).

Reference workflow: gpytorch/models/exact_gp.py:151 ``get_fantasy_model`` +
gpytorch/models/exact_prediction_strategies.py:137-265 (rank-m block-Schur cache
updates) and :513-677 (WISKI, Stanton et al., arXiv 2103.01454 — O(m²) online updates
in SKI inducing space) — the online-regression serving loop: observe a new point,
condition the posterior on it WITHOUT refitting, serve the next prediction.

Two serving modes:
  1. Dense exact GP: ``get_fantasy_model`` is a rank-m update of the mean/root caches —
     one small CG + an m×m Cholesky per batch of new points (never a full refit; the
     cache contract is asserted in tests/test_cache_contracts.py).
  2. KISS-GP/WISKI: the caches live in inducing space, so updates are O(m²) regardless
     of how many points have been absorbed — the right structure for long-running
     streams.

TPU notes: each fantasy update is a fixed-shape jittable computation; a serving
deployment compiles `update + predict` once and replays it per arrival.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gpytorch_tpu.distributions import MultivariateNormal
from gpytorch_tpu.kernels import GridInterpolationKernel, RBFKernel, ScaleKernel
from gpytorch_tpu.likelihoods import GaussianLikelihood
from gpytorch_tpu.means import ConstantMean
from gpytorch_tpu.models import ExactGP


class GP(ExactGP):
    def __init__(self, x, y, lik, kernel):
        super().__init__(x, y, lik)
        self.mean_module = ConstantMean()
        self.covar_module = kernel

    def forward(self, x):
        return MultivariateNormal(self.mean_module(x), self.covar_module(x))


def _f(x):
    return jnp.sin(2 * jnp.pi * x)


def _stream(model, xs, ys, test_x, chunk=4):
    """Absorb the stream in chunks via fantasy updates; return final predictions."""
    for s in range(0, xs.shape[0], chunk):
        model = model.get_fantasy_model(xs[s : s + chunk], ys[s : s + chunk])
    return model(test_x)


def main(quick: bool = False):
    n0, n_stream = (48, 16) if quick else (256, 64)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(key, (n0,))
    y0 = _f(x0) + 0.05 * jax.random.normal(jax.random.PRNGKey(1), (n0,))
    xs = jax.random.uniform(jax.random.PRNGKey(2), (n_stream,))
    ys = _f(xs) + 0.05 * jax.random.normal(jax.random.PRNGKey(3), (n_stream,))
    test_x = jnp.linspace(0.02, 0.98, 33)

    lik = GaussianLikelihood()
    lik.noise = 0.05

    # serving assumes a trained model — fix sensible hypers for the sin(2πx) stream
    def _kernel():
        k = ScaleKernel(RBFKernel())
        k.base_kernel.lengthscale = 0.2
        k.outputscale = 1.0
        return k

    def _ski_kernel():
        k = GridInterpolationKernel(RBFKernel(), grid_size=64, num_dims=1, grid_bounds=[(-0.1, 1.1)])
        k.base_kernel.lengthscale = 0.2
        return k

    # -- mode 1: dense exact GP with rank-m Schur fantasy updates --------------------------
    dense = GP(x0, y0, lik, _kernel()).eval()
    _ = dense(test_x)  # build the serving caches once
    pred_dense = _stream(dense, xs, ys, test_x)

    # -- mode 2: WISKI (KISS-GP caches in inducing space, O(m^2) per update) ----------------
    wiski = GP(x0, y0, lik, _ski_kernel()).eval()
    _ = wiski(test_x)
    pred_wiski = _stream(wiski, xs, ys, test_x)

    # -- ground truth: full refits on all n0 + n_stream points (same kernel per mode, so the
    # comparison isolates the UPDATE error, not SKI interpolation error) ---------------------
    x_all, y_all = jnp.concatenate([x0, xs]), jnp.concatenate([y0, ys])
    refit_dense = GP(x_all, y_all, lik, _kernel()).eval()
    refit_wiski = GP(x_all, y_all, lik, _ski_kernel()).eval()

    err_dense = float(jnp.max(jnp.abs(pred_dense.mean - refit_dense(test_x).mean)))
    err_wiski = float(jnp.max(jnp.abs(pred_wiski.mean - refit_wiski(test_x).mean)))
    mae = float(jnp.mean(jnp.abs(pred_dense.mean - _f(test_x))))
    print(f"dense fantasy vs full refit: max |Δmean| = {err_dense:.2e}")
    print(f"WISKI fantasy vs KISS-GP refit: max |Δmean| = {err_wiski:.2e}")
    print(f"served MAE vs truth: {mae:.4f}")
    assert err_dense < 1e-3, err_dense
    assert err_wiski < 1e-2, err_wiski
    assert mae < 0.05, mae
    return err_dense, err_wiski


if __name__ == "__main__":
    main()
