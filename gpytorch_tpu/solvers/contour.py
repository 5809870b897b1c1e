"""Contour-integral quadrature (CIQ): K^{±1/2} v via multi-shift CG.

Reference: linear_operator ``contour_integral_quad`` / ``sqrt_inv_matmul``
(gpytorch/__init__.py:252; used by CiqVariationalStrategy,
gpytorch/variational/ciq_variational_strategy.py:128; paper arXiv 2006.11267).

Method (Hale, Higham & Trefethen 2008):
  K^{-1/2} b ≈ Σ_j w_j (K + t_j I)⁻¹ b
with shifts/weights from Jacobi elliptic functions on [λ_min, λ_max].  All q shifted
systems share one Krylov space — each multi-shift-CG iteration costs a single K·v matvec
(Jegerlehner 1996 recurrences).

TPU design notes:
  * the elliptic node computation is implemented IN JAX (AGM for the complete integral,
    fixed-iteration descending Landen for sn/cn/dn), so the quadrature adapts to the
    (Lanczos-estimated, stop-gradient) spectrum even inside jit — no host scipy round-trip
    and no conservative-range fallback;
  * the shifted-CG loop is a fixed-trip ``fori_loop`` (reverse-differentiable; the CIQ
    variational strategy takes gradients through it).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .. import settings
from .lanczos import lanczos_tridiag

_AGM_ITERS = 30


def _ellipk_agm(m):
    """Complete elliptic integral K(m) via the arithmetic-geometric mean."""
    a = jnp.ones_like(m)
    b = jnp.sqrt(jnp.maximum(1.0 - m, 1e-300))
    for _ in range(_AGM_ITERS):
        a, b = 0.5 * (a + b), jnp.sqrt(a * b)
    return jnp.pi / (2.0 * a)


def _ellipj_im(u, m):
    """Jacobi elliptic sn/cn/dn at a purely *imaginary* argument iu, parameter m.

    Uses the Jacobi imaginary transformation: with m1 = 1−m and s = sn(u|m1),
    c = cn(u|m1), d = dn(u|m1) (all real, computed by descending Landen):
      sn(iu|m) = i s/c,  cn(iu|m) = 1/c,  dn(iu|m) = d/c.
    Returns the real quantities (s/c, 1/c, d/c).
    """
    m1 = 1.0 - m
    s, c, d = _ellipj_real(u, m1)
    return s / c, 1.0 / c, d / c


def _ellipj_real(u, m):
    """sn/cn/dn(u|m) for real u via the descending-Landen / AGM algorithm
    (Abramowitz & Stegun 16.4; fixed iteration count for jit)."""
    eps = 1e-300
    a = jnp.ones_like(u)
    b = jnp.sqrt(jnp.maximum(1.0 - m, eps)) * jnp.ones_like(u)
    a_list = []  # a_n, c_n for n = 1.._AGM_ITERS (post-update values)
    c_list = []
    for _ in range(_AGM_ITERS):
        a, b, c = 0.5 * (a + b), jnp.sqrt(jnp.maximum(a * b, eps)), 0.5 * (a - b)
        a_list.append(a)
        c_list.append(c)
    phi = (2.0**_AGM_ITERS) * a * u
    for n in range(_AGM_ITERS - 1, -1, -1):  # n indexes a_{n+1}, c_{n+1}: loop N..1
        ratio = jnp.clip(c_list[n] / jnp.maximum(a_list[n], eps), -1.0, 1.0)
        phi = 0.5 * (phi + jnp.arcsin(ratio * jnp.sin(phi)))
    sn = jnp.sin(phi)
    cn = jnp.cos(phi)
    dn = jnp.sqrt(jnp.maximum(1.0 - m * sn * sn, eps))
    return sn, cn, dn


def _elliptic_nodes(min_eig, max_eig, num_quad: int):
    """Quadrature shifts/weights for f(K)=K^{-1/2} on [min_eig, max_eig] (HHT 2008 method 3,
    matching linear_operator's contour_integral_quad).  Fully traced jnp math."""
    min_eig = jnp.asarray(min_eig, dtype=jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    max_eig = jnp.asarray(max_eig, dtype=min_eig.dtype)
    k2 = jnp.clip(min_eig / max_eig, 1e-10, 1.0 - 1e-10)
    Kp = _ellipk_agm(1.0 - k2)  # K'(k) = K(1−k²)
    u = (jnp.arange(1, num_quad + 1, dtype=min_eig.dtype) - 0.5) * Kp / num_quad
    # sn/cn/dn at the imaginary argument i·u with parameter k2
    sn_i, cn_i, dn_i = _ellipj_im(u, k2)  # sn(iu|k2) = i·sn_i ; cn = cn_i ; dn = dn_i
    # w = √(λ_min)·sn(iu) → purely imaginary: w² = −λ_min·sn_i² → shift t_j = λ_min·sn_i²
    shifts = min_eig * sn_i * sn_i
    # dz/dt = cn(iu)·dn(iu) (real); weight_j = (2 K' √λ_min)/(π q) · cn_i·dn_i
    weights = (2.0 * Kp * jnp.sqrt(min_eig)) / (jnp.pi * num_quad) * (cn_i * dn_i)
    return shifts, weights


def _estimate_spectrum(linop) -> Tuple[jax.Array, jax.Array]:
    """Cheap extremal-eigenvalue estimates via a few Lanczos iterations (stop-gradient:
    the quadrature nodes tune the estimator, not the gradient identity)."""
    n = linop.shape[-1]
    k = min(10, n)
    init = jnp.ones(linop.batch_shape + (n,), dtype=linop.dtype)
    _, T = lanczos_tridiag(lambda v: jax.lax.stop_gradient(linop._matmul(v)), init, k)
    lam = jnp.linalg.eigvalsh(jax.lax.stop_gradient(T))
    min_e = jnp.min(jnp.maximum(lam[..., 0], 1e-7)) * 0.8
    max_e = jnp.max(lam[..., -1]) * 1.2
    return min_e, max_e


def shifted_cg(matmul_fn, rhs, shifts, max_iter: int, tol: Optional[float] = None):
    """Multi-shift CG (Jegerlehner 1996): solve (A + t_j I) x_j = rhs for all shifts with
    one matvec per iteration (shift-invariance of Krylov spaces).

    rhs: (..., n, t); shifts: (q,) ≥ 0.  Returns (q, ..., n, t).

    ``tol``: relative residual (of the unshifted system — it upper-bounds every shifted
    residual) below which the loop exits early; defaults to
    ``settings.minres_tolerance`` (the reference knob gating msMINRES convergence).
    """
    if tol is None:
        tol = float(settings.minres_tolerance.value())
    q = shifts.shape[0]
    dt = rhs.dtype

    x = jnp.zeros((q,) + rhs.shape, dt)
    r = rhs
    p = rhs
    p_s = jnp.broadcast_to(rhs, (q,) + rhs.shape)
    rz = jnp.sum(r * r, axis=-2)  # (..., t)
    zeta_prev = jnp.ones((q,) + rz.shape, dt)
    zeta_cur = jnp.ones((q,) + rz.shape, dt)
    alpha_prev = jnp.ones(rz.shape, dt)
    beta_prev = jnp.zeros(rz.shape, dt)
    sh = shifts.astype(dt).reshape((q,) + (1,) * rz.ndim)  # broadcasts against (q, ..., t)
    eps = 1e-30

    def body(_, state):
        x, r, p, p_s, rz, zeta_prev, zeta_cur, alpha_prev, beta_prev = state
        Ap = matmul_fn(p)
        pAp = jnp.sum(p * Ap, axis=-2)
        dead = rz < eps
        alpha = jnp.where(dead, 0.0, rz / jnp.where(jnp.abs(pAp) < eps, 1.0, pAp))

        # ζ_{k+1}^σ  (Jegerlehner eq. 2.44)
        denom = (
            alpha * beta_prev * (zeta_prev - zeta_cur)
            + zeta_prev * alpha_prev * (1.0 + sh * alpha)
        )
        zeta_next = jnp.where(
            jnp.abs(denom) < eps, zeta_cur, zeta_cur * zeta_prev * alpha_prev / jnp.where(jnp.abs(denom) < eps, 1.0, denom)
        )
        ratio = zeta_next / jnp.where(jnp.abs(zeta_cur) < eps, 1.0, zeta_cur)
        alpha_s = alpha * ratio
        x = x + alpha_s[..., None, :] * p_s

        r_new = r - alpha[..., None, :] * Ap
        rz_new = jnp.sum(r_new * r_new, axis=-2)
        beta = jnp.where(dead, 0.0, rz_new / jnp.where(rz < eps, 1.0, rz))
        p_new = r_new + beta[..., None, :] * p
        beta_s = beta * ratio * ratio
        p_s_new = zeta_next[..., None, :] * r_new + beta_s[..., None, :] * p_s
        return (x, r_new, p_new, p_s_new, rz_new, zeta_cur, zeta_next, alpha, beta)

    rhs_norm2 = jnp.maximum(jnp.max(jnp.sum(rhs * rhs, axis=-2)), eps)

    def body_k(state_k):
        k, state = state_k
        return (k + 1, body(k, state))

    def cond_k(state_k):
        k, state = state_k
        rz_cur = state[4]
        return jnp.logical_and(k < max_iter, jnp.max(rz_cur) > (tol * tol) * rhs_norm2)

    state = (x, r, p, p_s, rz, zeta_prev, zeta_cur, alpha_prev, beta_prev)
    _, state = jax.lax.while_loop(cond_k, body_k, (jnp.asarray(0, jnp.int32), state))
    return state[0]


from functools import partial


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _ciq_quad(linop, rhs, shifts_weights, max_iter: int):
    """Σ_j w_j (K + t_j I)⁻¹ rhs with a quadrature-structured VJP.

    Differentiating *through* the shifted-CG loop is numerically hazardous (the ζ
    recurrences underflow over many iterations, NaN'ing the reverse pass); instead the
    backward exploits d[(K+t)⁻¹] = −(K+t)⁻¹ dK (K+t)⁻¹ — one more multi-shift CG on the
    cotangent (this mirrors linear_operator's contour_integral_quad autograd)."""
    shifts, weights = shifts_weights
    solves = shifted_cg(lambda v: linop._matmul(v), rhs, shifts, max_iter=max_iter)
    w = weights.reshape((-1,) + (1,) * rhs.ndim)
    return jnp.sum(w * solves, axis=0)


def _ciq_quad_fwd(linop, rhs, shifts_weights, max_iter):
    shifts, weights = shifts_weights
    linop_d = jax.tree_util.tree_map(jax.lax.stop_gradient, linop)
    solves = shifted_cg(lambda v: linop_d._matmul(v), rhs, shifts, max_iter=max_iter)
    w = weights.reshape((-1,) + (1,) * rhs.ndim)
    out = jnp.sum(w * solves, axis=0)
    return out, (linop, rhs, shifts, weights, solves)


def _ciq_quad_bwd(max_iter, res, g):
    linop, rhs, shifts, weights, solves = res
    linop_d = jax.tree_util.tree_map(jax.lax.stop_gradient, linop)
    u = shifted_cg(lambda v: linop_d._matmul(v), g, shifts, max_iter=max_iter)  # (q, ..., n, t)
    w = weights.reshape((-1,) + (1,) * rhs.ndim)
    rhs_bar = jnp.sum(w * u, axis=0)

    solves_sg = jax.lax.stop_gradient(solves)
    u_sg = jax.lax.stop_gradient(u)

    def scalar_fn(lo):
        # −Σ_j w_j u_jᵀ dK s_j, delivered through the operator matmul VJP
        Ks = lo._matmul(jnp.moveaxis(solves_sg, 0, -1).reshape(solves_sg.shape[1:-1] + (-1,)))
        u_flat = jnp.moveaxis(u_sg * w, 0, -1).reshape(u_sg.shape[1:-1] + (-1,))
        return -jnp.sum(u_flat * Ks)

    _, vjp = jax.vjp(scalar_fn, linop)
    (linop_bar,) = vjp(jnp.ones((), dtype=rhs.dtype))
    sw_bar = jax.tree_util.tree_map(
        lambda x: jnp.zeros_like(x), (shifts, weights)
    )
    return linop_bar, rhs_bar, sw_bar


_ciq_quad.defvjp(_ciq_quad_fwd, _ciq_quad_bwd)


def contour_integral_quad(linop, rhs, inverse: bool = True, num_quad: Optional[int] = None):
    """Return K^{-1/2} rhs (inverse=True) or K^{1/2} rhs."""
    if num_quad is None:
        num_quad = settings.num_contour_quadrature.value()
    min_eig, max_eig = _estimate_spectrum(linop)
    shifts, weights = _elliptic_nodes(min_eig, max_eig, int(num_quad))
    shifts = jax.lax.stop_gradient(shifts.astype(rhs.dtype))
    weights = jax.lax.stop_gradient(weights.astype(rhs.dtype))
    max_iter = int(settings.max_minres_iterations.value())
    inv_sqrt = _ciq_quad(linop, rhs, (shifts, weights), max_iter)
    if inverse:
        return inv_sqrt
    return linop._matmul(inv_sqrt)  # K^{1/2} = K · K^{-1/2}


def sqrt_inv_matmul(linop, rhs, lhs: Optional[jax.Array] = None):
    """K^{-1/2} rhs (and optionally lhs K^{-1/2} rhs) — reference gpytorch/__init__.py:252."""
    rhs = jnp.asarray(rhs)
    squeeze = rhs.ndim == 1
    if squeeze:
        rhs = rhs[:, None]
    res = contour_integral_quad(linop, rhs, inverse=True)
    if lhs is not None:
        res = lhs @ res
    return res[..., 0] if squeeze else res
