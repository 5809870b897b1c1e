"""Distributed (row-sharded) mBCG exact-GP marginal log likelihood.

This is the TPU-native replacement for the reference's ``MultiDeviceKernel``
(gpytorch/kernels/multi_device_kernel.py:14 — torch DataParallel scatter/gather): the N
training rows are sharded over a ``jax.sharding.Mesh`` axis; every CG iteration does
  1. all_gather of the search-direction block over ICI,
  2. a local fused Pallas kernel matvec on the device's row block,
  3. ``psum`` reductions for the CG inner products,
so all devices follow an identical CG trajectory and the N×N kernel matrix never exists —
on any device.  (SURVEY §2.2/§5: the "ring-attention analogue" for GP inference.)

The custom VJP implements the same BBMM estimators as solvers/inv_quad.py, with psum'd
quadratic forms, so ``jax.grad`` of the sharded MLL gives exact distributed gradients.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .sharded import shard_map  # VMA-checker-off wrapper (see sharded.py)

from ..ops import pallas_kernels as pk
from ..solvers.cg import linear_cg, tridiag_from_coeffs


@dataclasses.dataclass(frozen=True)
class ShardedMBCGConfig:
    kernel_type: int = pk.RBF
    num_probes: int = 10
    max_cg_iters: int = 100
    cg_tolerance: float = 1.0
    n_tridiag_iter: int = 20
    axis_name: str = "data"
    seed: int = 0


def _mll_body(cfg: ShardedMBCGConfig, n_global: int, params, x_local, y_local):
    """Runs per-device under shard_map.  params = (raw lengthscale ℓ, outputscale, noise, mean)."""
    ls, outputscale, noise, mean_const = params
    axis = cfg.axis_name
    idx = jax.lax.axis_index(axis)
    n_local = x_local.shape[0]

    xs_local = x_local / ls
    xs_full = jax.lax.all_gather(xs_local, axis, tiled=True)

    def matvec(v_local):
        v_full = jax.lax.all_gather(v_local, axis, tiled=True)
        out = pk.fused_kernel_matvec(xs_local, xs_full, v_full, cfg.kernel_type)
        return out * outputscale + noise * v_local

    diff = (y_local - mean_const)[:, None]
    key = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), idx)
    probes = jax.random.normal(key, (n_local, cfg.num_probes), dtype=x_local.dtype)
    pn2 = jax.lax.psum(jnp.sum(probes * probes, axis=0), axis)
    probes = probes / jnp.sqrt(pn2)

    rhs_all = jnp.concatenate([diff, probes], axis=-1)
    result = linear_cg(
        matvec,
        rhs_all,
        max_iter=cfg.max_cg_iters,
        tolerance=cfg.cg_tolerance,
        n_tridiag_iter=cfg.n_tridiag_iter,
        axis_name=axis,
        global_n=n_global,
    )
    solves = result.solution
    s_diff = solves[:, :1]
    s_probe = solves[:, 1:]

    inv_quad = jax.lax.psum(jnp.sum(diff * s_diff), axis)
    # SLQ logdet — tridiag coefficients are built from psum'd scalars → identical everywhere
    T = tridiag_from_coeffs(result.alphas[..., 1:], result.betas[..., 1:])
    lam, V = jnp.linalg.eigh(T)
    lam = jnp.maximum(lam, 1e-20)
    w = V[..., 0, :] ** 2
    logdet = n_global * jnp.mean(jnp.sum(w * jnp.log(lam), axis=-1))
    residuals = (s_diff, probes, s_probe, diff)
    return inv_quad, logdet, residuals


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _sharded_neg_mll(cfg: ShardedMBCGConfig, n_global: int, params, x_local, y_local):
    inv_quad, logdet, _ = _mll_body(cfg, n_global, params, x_local, y_local)
    return 0.5 * (inv_quad + logdet + n_global * math.log(2 * math.pi)) / n_global


def _snm_fwd(cfg, n_global, params, x_local, y_local):
    inv_quad, logdet, res = _mll_body(cfg, n_global, params, x_local, y_local)
    loss = 0.5 * (inv_quad + logdet + n_global * math.log(2 * math.pi)) / n_global
    return loss, (params, x_local, y_local, res)


def _snm_bwd(cfg, n_global, saved, g):
    params, x_local, y_local, res = saved
    s_diff, probes, s_probe, diff = res
    axis = cfg.axis_name
    scale = g * 0.5 / n_global

    def quad_through_K(p):
        ls, outputscale, noise, mean_const = p
        xs_local = x_local / ls
        xs_full = jax.lax.all_gather(xs_local, axis, tiled=True)

        def matvec_nograd_inputs(v_local):
            v_full = jax.lax.all_gather(jax.lax.stop_gradient(v_local), axis, tiled=True)
            out = pk.fused_kernel_matvec(xs_local, xs_full, v_full, cfg.kernel_type)
            return out * outputscale + noise * jax.lax.stop_gradient(v_local)

        sd = jax.lax.stop_gradient(s_diff)
        sp = jax.lax.stop_gradient(s_probe)
        pz = jax.lax.stop_gradient(probes)
        # d(yᵀK⁻¹y)/dθ = −sᵀ (dK) s ;  d logdet/dθ ≈ mean_j n · ŝ_jᵀ (dK) ẑ_j  (probes ~ N(0, I))
        Ksd = matvec_nograd_inputs(sd)
        term_iq = -jax.lax.psum(jnp.sum(sd * Ksd), axis)
        Kpz = matvec_nograd_inputs(pz)
        est = jax.lax.psum(jnp.sum(sp * Kpz, axis=0), axis)  # (t,)
        # probes are unit-normalized → tr(K⁻¹dK) ≈ n · mean_j ŝ_jᵀ dK ẑ_j
        term_ld = n_global * jnp.mean(est)
        return term_iq + term_ld

    # every matvec operand above is stop-gradiented — skip the dead dv = Kᵀg product in
    # the fused-kernel VJP (settings.skip_matvec_cotangent), one full matvec saved/step
    from .. import settings

    with settings.skip_matvec_cotangent(True):
        _, vjp = jax.vjp(quad_through_K, params)
        (p_bar,) = vjp(jnp.asarray(scale, x_local.dtype))
    # mean-constant gradient: d loss/dμ = −(1ᵀ K⁻¹ (y−μ)) / n_global · g
    sum_solve = jax.lax.psum(jnp.sum(s_diff), cfg.axis_name)
    ls_bar, os_bar, noise_bar, mean_bar_from_quad = p_bar
    mean_bar = -g * sum_solve / n_global + mean_bar_from_quad
    y_bar = g * s_diff[:, 0] / n_global
    return (ls_bar, os_bar, noise_bar, mean_bar), jnp.zeros_like(x_local), y_bar


_sharded_neg_mll.defvjp(_snm_fwd, _snm_bwd)


def sharded_exact_gp_mll(
    mesh: Mesh,
    x,
    y,
    lengthscale,
    outputscale,
    noise,
    mean_const,
    config: Optional[ShardedMBCGConfig] = None,
):
    """Negative MLL / n of an exact (Scale∘RBF|Matérn)+Gaussian GP with rows sharded over
    ``mesh``'s '{config.axis_name}' axis.  Differentiable w.r.t. all four hyperparameters.

    x: (n, d) sharded (or shardable) on rows; y: (n,).
    """
    cfg = config or ShardedMBCGConfig()
    n_global = x.shape[0]
    params = (
        jnp.asarray(lengthscale),
        jnp.asarray(outputscale),
        jnp.asarray(noise),
        jnp.asarray(mean_const),
    )

    fn = shard_map(
        partial(_sharded_neg_mll, cfg, n_global),
        mesh=mesh,
        in_specs=(
            (P(), P(), P(), P()),
            P(cfg.axis_name, None),
            P(cfg.axis_name),
        ),
        out_specs=P(),
    )
    return fn(params, x, y)


def sharded_posterior_mean(
    mesh: Mesh,
    x,
    y,
    test_x,
    lengthscale,
    outputscale,
    noise,
    mean_const,
    config: Optional[ShardedMBCGConfig] = None,
):
    """Posterior mean at test points with the train solve sharded over the mesh."""
    cfg = config or ShardedMBCGConfig()
    n_global = x.shape[0]

    def body(x_local, y_local, test_x_rep):
        axis = cfg.axis_name
        ls = jnp.asarray(lengthscale)
        xs_local = x_local / ls
        xs_full = jax.lax.all_gather(xs_local, axis, tiled=True)

        def matvec(v_local):
            v_full = jax.lax.all_gather(v_local, axis, tiled=True)
            return pk.fused_kernel_matvec(xs_local, xs_full, v_full, cfg.kernel_type) * outputscale + noise * v_local

        diff = (y_local - mean_const)[:, None]
        result = linear_cg(
            matvec, diff, max_iter=cfg.max_cg_iters, tolerance=min(cfg.cg_tolerance, 0.01),
            axis_name=axis, global_n=n_global,
        )
        sol_local = result.solution  # (n_local, 1)
        # K(test, train_local) @ sol_local, psum over devices
        t_scaled = test_x_rep / ls
        contrib = pk.fused_kernel_matvec(t_scaled, xs_local, sol_local, cfg.kernel_type) * outputscale
        return jax.lax.psum(contrib[:, 0], axis) + mean_const

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(cfg.axis_name, None), P(cfg.axis_name), P()),
        out_specs=P(),
    )
    return fn(x, y, test_x)
