"""Contour-integral quadrature (CIQ): K^{±1/2} v via shifted minres.

Reference: linear_operator ``contour_integral_quad`` / ``sqrt_inv_matmul``
(gpytorch/__init__.py:252; used by CiqVariationalStrategy,
gpytorch/variational/ciq_variational_strategy.py:128; paper arXiv 2006.11267).

Method: K^{-1/2} b = (2 K / (π N)) Σ_j w_j (K + t_j I)⁻¹ b with quadrature nodes from
Jacobi elliptic functions (Hale, Higham & Trefethen 2008).  The N shifted solves share one
Krylov space via multi-shift CG — each iteration is still a single K·v matvec.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import settings
from .lanczos import lanczos_tridiag


def _elliptic_nodes(min_eig: float, max_eig: float, num_quad: int):
    """Quadrature shifts/weights for f(K)=K^{-1/2} on [min_eig, max_eig] (host-side numpy —
    the node computation uses special functions on scalars and compiles to constants)."""
    from scipy import special  # available via jax's scipy dependency

    k2 = min_eig / max_eig
    Kp = special.ellipk(1 - k2)
    t = 1j * (np.arange(1, num_quad + 1) - 0.5) * Kp / num_quad
    sn, cn, dn, _ = special.ellipj(np.imag(t), 1 - k2)
    cn = 1.0 / cn
    dn = dn * cn
    sn = 1j * sn * cn
    w = np.sqrt(min_eig) * sn
    dzdt = cn * dn
    shifts = np.real(-(w**2))
    weights = np.real(2 * Kp * np.sqrt(min_eig) / (np.pi * num_quad) * dzdt)
    return jnp.asarray(shifts), jnp.asarray(weights)


def _estimate_spectrum(linop) -> Tuple[jax.Array, jax.Array]:
    """Cheap extremal-eigenvalue estimates via a few Lanczos iterations."""
    n = linop.shape[-1]
    k = min(10, n)
    init = jnp.ones(linop.batch_shape + (n,), dtype=linop.dtype)
    _, T = lanczos_tridiag(lambda v: linop._matmul(v), init, k)
    lam = jnp.linalg.eigvalsh(T)
    return jnp.maximum(lam[..., 0], 1e-7), lam[..., -1] * 1.1


def shifted_cg(matmul_fn, rhs, shifts, max_iter: int, tol: float = 1e-6):
    """Multi-shift CG: solve (A + t_j I) x_j = rhs for all shifts simultaneously.

    Uses the shift-invariance of Krylov spaces: one matvec per iteration serves all shifts.
    rhs: (..., n, t); shifts: (q,).  Returns (q, ..., n, t).
    """
    q = shifts.shape[0]
    x = jnp.zeros((q,) + rhs.shape, rhs.dtype)
    # Run standard CG on the base system; track shifted recurrences
    r = rhs
    p = rhs
    p_s = jnp.broadcast_to(rhs, (q,) + rhs.shape)
    rz = jnp.sum(r * r, axis=-2)
    zeta_old = jnp.ones((q,) + rz.shape, rhs.dtype)
    zeta = jnp.ones((q,) + rz.shape, rhs.dtype)
    alpha_old = jnp.ones((q,) + rz.shape, rhs.dtype)
    beta_old = jnp.zeros(rz.shape, rhs.dtype)
    alpha_prev = jnp.ones(rz.shape, rhs.dtype)

    def body(k, state):
        x, r, p, p_s, rz, zeta_old, zeta, alpha_old, beta_old, alpha_prev = state
        Ap = matmul_fn(p)
        pAp = jnp.sum(p * Ap, axis=-2)
        alpha = rz / jnp.where(jnp.abs(pAp) < 1e-20, 1.0, pAp)
        alpha = jnp.where(rz < 1e-20, jnp.zeros_like(alpha), alpha)
        # shifted coefficient updates (Jegerlehner 1996)
        sh = shifts.reshape((q,) + (1,) * rz.ndim)
        denom = zeta_old * alpha_prev + alpha * (beta_old * (zeta_old - zeta) + zeta_old * (1.0 + sh * alpha))
        zeta_new = jnp.where(jnp.abs(denom) < 1e-30, zeta, zeta_old * zeta * alpha_prev / denom)
        alpha_s = alpha * zeta_new / jnp.where(jnp.abs(zeta) < 1e-30, 1.0, zeta)
        x = x + alpha_s[..., None, :] * p_s
        r_new = r - alpha[..., None, :] * Ap
        rz_new = jnp.sum(r_new * r_new, axis=-2)
        beta = rz_new / jnp.where(rz < 1e-20, 1.0, rz)
        beta = jnp.where(rz < 1e-20, jnp.zeros_like(beta), beta)
        p_new = r_new + beta[..., None, :] * p
        beta_s = beta * (zeta_new / jnp.where(jnp.abs(zeta) < 1e-30, 1.0, zeta)) ** 2
        p_s_new = zeta_new[..., None, :] * r_new + beta_s[..., None, :] * p_s
        return (x, r_new, p_new, p_s_new, rz_new, zeta, zeta_new, alpha_s, beta, alpha)

    state = (x, r, p, p_s, rz, zeta_old, zeta, alpha_old, beta_old, alpha_prev)
    state = jax.lax.fori_loop(0, max_iter, body, state)
    return state[0]


def contour_integral_quad(linop, rhs, inverse: bool = True, num_quad: Optional[int] = None):
    """Return K^{-1/2} rhs (inverse=True) or K^{1/2} rhs."""
    if num_quad is None:
        num_quad = settings.num_contour_quadrature.value()
    min_eig, max_eig = _estimate_spectrum(linop)
    # static bounds: use stop-gradient scalars folded at trace time where possible
    min_e = float(jax.lax.stop_gradient(jnp.min(min_eig))) if not isinstance(min_eig, jax.core.Tracer) else 1e-4
    max_e = float(jax.lax.stop_gradient(jnp.max(max_eig))) if not isinstance(max_eig, jax.core.Tracer) else 1e4
    shifts, weights = _elliptic_nodes(max(min_e, 1e-7), max(max_e, 1e-5), int(num_quad))
    max_iter = settings.max_minres_iterations.value()
    solves = shifted_cg(lambda v: linop._matmul(v), rhs, shifts, max_iter=max_iter)
    w = weights.reshape((-1,) + (1,) * rhs.ndim)
    inv_sqrt = jnp.sum(w * solves, axis=0)  # ≈ K^{-1/2} rhs
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
