"""Derivative-GP kernels: covariances between function values and gradients.

References: gpytorch/kernels/rbf_kernel_grad.py:11, rbf_kernel_gradgrad.py:11,
matern52_kernel_grad.py:16, polynomial_kernel_grad.py:10.  Each point contributes
``num_outputs_per_input`` consecutive rows: [f, ∂₁f, ..., ∂_df] (+ diagonal second
derivatives for GradGrad).  Blocks are assembled with vectorized outer products — one fused
XLA kernel, no per-pair loops.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .kernel import Kernel
from .linear_kernel import PolynomialKernel
from .stationary import MaternKernel, RBFKernel


def _interleave_blocks(blocks):
    """blocks: (..., n, m, A, B) → (..., n·A, m·B)."""
    b = jnp.swapaxes(blocks, -3, -2)  # (..., n, A, m, B)
    sh = b.shape
    return b.reshape(sh[:-4] + (sh[-4] * sh[-3], sh[-2] * sh[-1]))


class RBFKernelGrad(RBFKernel):
    """Reference: rbf_kernel_grad.py:11."""

    def num_outputs_per_input(self, x1, x2):
        return x1.shape[-1] + 1

    def forward(self, x1, x2, diag=False, last_dim_is_batch=False, **params):
        if last_dim_is_batch:
            raise RuntimeError("RBFKernelGrad does not support last_dim_is_batch")
        d = x1.shape[-1]
        ls2 = (self.lengthscale[..., 0, :] ** 2)  # (..., d)
        tau = x1[..., :, None, :] - x2[..., None, :, :]  # (..., n, m, d)
        d2 = jnp.sum(tau**2 / ls2[..., None, None, :], axis=-1)
        k = jnp.exp(-0.5 * d2)  # (..., n, m)

        t_over_l = tau / ls2[..., None, None, :]  # τ_a/ℓ_a²
        # block[0,0] = k; block[0,b] = τ_b/ℓ² k; block[a,0] = −τ_a/ℓ² k
        # block[a,b] = (δ_ab/ℓ² − τ_aτ_b/(ℓ²ℓ²)) k
        A = d + 1
        blocks = jnp.zeros(k.shape + (A, A), dtype=k.dtype)
        blocks = blocks.at[..., 0, 0].set(k)
        blocks = blocks.at[..., 0, 1:].set(t_over_l * k[..., None])
        blocks = blocks.at[..., 1:, 0].set(-t_over_l * k[..., None])
        outer = t_over_l[..., :, None] * t_over_l[..., None, :]  # (..., n, m, d, d)
        eye = jnp.eye(d, dtype=k.dtype) / ls2[..., None, None, :, None]
        blocks = blocks.at[..., 1:, 1:].set((eye - outer) * k[..., None, None])
        if diag:
            n = min(x1.shape[-2], x2.shape[-2])
            idx = jnp.arange(n)
            diag_blocks = blocks[..., idx, idx, :, :]  # (..., n, A, A)
            return jnp.diagonal(diag_blocks, axis1=-2, axis2=-1).reshape(diag_blocks.shape[:-3] + (n * A,))
        return _interleave_blocks(blocks)


class RBFKernelGradGrad(RBFKernel):
    """Adds diagonal second derivatives: outputs [f, ∇f, diag(∇²f)] per point
    (reference: rbf_kernel_gradgrad.py:11)."""

    def num_outputs_per_input(self, x1, x2):
        return 2 * x1.shape[-1] + 1

    def forward(self, x1, x2, diag=False, last_dim_is_batch=False, **params):
        if last_dim_is_batch:
            raise RuntimeError("RBFKernelGradGrad does not support last_dim_is_batch")
        d = x1.shape[-1]
        ls2 = self.lengthscale[..., 0, :] ** 2
        tau = x1[..., :, None, :] - x2[..., None, :, :]
        d2 = jnp.sum(tau**2 / ls2[..., None, None, :], axis=-1)
        k = jnp.exp(-0.5 * d2)
        u = tau / ls2[..., None, None, :]  # τ_a/ℓ_a² (..., n, m, d)
        il = 1.0 / ls2[..., None, None, :]  # 1/ℓ_a²

        A = 2 * d + 1
        blocks = jnp.zeros(k.shape + (A, A), dtype=k.dtype)
        kk = k[..., None]
        kkk = k[..., None, None]

        # value-value / value-grad / grad-grad (same as RBFKernelGrad)
        blocks = blocks.at[..., 0, 0].set(k)
        blocks = blocks.at[..., 0, 1 : d + 1].set(u * kk)
        blocks = blocks.at[..., 1 : d + 1, 0].set(-u * kk)
        outer = u[..., :, None] * u[..., None, :]
        eye_l = jnp.eye(d, dtype=k.dtype) * il[..., None]
        blocks = blocks.at[..., 1 : d + 1, 1 : d + 1].set((eye_l - outer) * kkk)

        # second-derivative interactions.  With D_b = ∂²/∂x'_b²:
        # ∂²k/∂x'_b² = (u_b² − 1/ℓ_b²) k
        d2k = (u**2 - il) * kk  # (..., n, m, d)
        blocks = blocks.at[..., 0, d + 1 :].set(d2k)
        blocks = blocks.at[..., d + 1 :, 0].set(d2k)
        # ∂³k/∂x_a ∂x'_b² = 2δ_ab u_b k/ℓ² − u_a(u_b² − 1/ℓ_b²)k
        eye_d = jnp.eye(d, dtype=k.dtype)
        third = -u[..., :, None] * d2k[..., None, :] + 2.0 * eye_d * (u * il)[..., None, :] * kkk
        blocks = blocks.at[..., 1 : d + 1, d + 1 :].set(third)
        # ∂³k/∂x_a² ∂x'_b = −(∂³k/∂x_b ∂x'_a²) with roles swapped
        blocks = blocks.at[..., d + 1 :, 1 : d + 1].set(-jnp.swapaxes(third, -1, -2))
        # ∂⁴k/∂x_a²∂x'_b²
        # = [(u_a²−1/ℓ_a²)(u_b²−1/ℓ_b²) + 2δ_ab(1/(ℓ_a²ℓ_b²) − 2u_a u_b/ℓ_b²) + (1−δ_ab)·0
        #    ... general: (u_a²−ila)(u_b²−ilb)k + δ_ab(2 ila² − 4 ila u_a²... ) ] k
        uu = u**2
        base4 = (uu - il)[..., :, None] * (uu - il)[..., None, :]
        corr = eye_d * (2.0 * (il * il) - 4.0 * (uu * il))[..., None, :]
        blocks = blocks.at[..., d + 1 :, d + 1 :].set((base4 + corr) * kkk)

        if diag:
            n = min(x1.shape[-2], x2.shape[-2])
            idx = jnp.arange(n)
            diag_blocks = blocks[..., idx, idx, :, :]
            return jnp.diagonal(diag_blocks, axis1=-2, axis2=-1).reshape(diag_blocks.shape[:-3] + (n * A,))
        return _interleave_blocks(blocks)


class Matern52KernelGrad(MaternKernel):
    """Closed-form Matérn-5/2 derivative blocks (reference: matern52_kernel_grad.py:16)."""

    def __init__(self, **kwargs):
        kwargs.pop("nu", None)
        super().__init__(nu=2.5, **kwargs)

    def num_outputs_per_input(self, x1, x2):
        return x1.shape[-1] + 1

    def forward(self, x1, x2, diag=False, last_dim_is_batch=False, **params):
        if last_dim_is_batch:
            raise RuntimeError("Matern52KernelGrad does not support last_dim_is_batch")
        d = x1.shape[-1]
        ls2 = self.lengthscale[..., 0, :] ** 2
        tau = x1[..., :, None, :] - x2[..., None, :, :]
        r2 = jnp.sum(tau**2 / ls2[..., None, None, :], axis=-1)
        r = jnp.sqrt(jnp.maximum(r2, 1e-30))
        s5 = math.sqrt(5.0)
        e = jnp.exp(-s5 * r)
        k = (1.0 + s5 * r + 5.0 / 3.0 * r2) * e
        # dk/dτ_a = −(5/3)(1 + √5 r) e^{−√5 r} τ_a/ℓ_a²   (smooth at r=0)
        g = (5.0 / 3.0) * (1.0 + s5 * r) * e  # (..., n, m)
        u = tau / ls2[..., None, None, :]
        A = d + 1
        blocks = jnp.zeros(k.shape + (A, A), dtype=k.dtype)
        blocks = blocks.at[..., 0, 0].set(k)
        blocks = blocks.at[..., 0, 1:].set(g[..., None] * u)
        blocks = blocks.at[..., 1:, 0].set(-g[..., None] * u)
        # ∂²k/∂x_a∂x'_b = (5/3)[(1+√5r)δ_ab/ℓ_b² − 5 τ_aτ_b/(ℓ_a²ℓ_b²)] e^{−√5 r}
        eye_l = jnp.eye(d, dtype=k.dtype) / ls2[..., None, None, :, None]
        outer = u[..., :, None] * u[..., None, :]
        hess = (5.0 / 3.0) * ((1.0 + s5 * r)[..., None, None] * eye_l - 5.0 * outer) * e[..., None, None]
        blocks = blocks.at[..., 1:, 1:].set(hess)
        if diag:
            n = min(x1.shape[-2], x2.shape[-2])
            idx = jnp.arange(n)
            diag_blocks = blocks[..., idx, idx, :, :]
            return jnp.diagonal(diag_blocks, axis1=-2, axis2=-1).reshape(diag_blocks.shape[:-3] + (n * A,))
        return _interleave_blocks(blocks)


class PolynomialKernelGrad(PolynomialKernel):
    """Reference: polynomial_kernel_grad.py:10 — k = (x·x'+c)^p with gradient blocks."""

    def num_outputs_per_input(self, x1, x2):
        return x1.shape[-1] + 1

    def forward(self, x1, x2, diag=False, last_dim_is_batch=False, **params):
        if last_dim_is_batch:
            raise RuntimeError("PolynomialKernelGrad does not support last_dim_is_batch")
        d = x1.shape[-1]
        c = self.offset
        p = self.power
        base = x1 @ jnp.swapaxes(x2, -1, -2) + c[..., None]  # (..., n, m)
        k = base**p
        bp1 = base ** (p - 1)
        bp2 = base ** (p - 2) if p >= 2 else jnp.zeros_like(base)
        A = d + 1
        blocks = jnp.zeros(k.shape + (A, A), dtype=k.dtype)
        blocks = blocks.at[..., 0, 0].set(k)
        # ∂k/∂x'_b = p·base^{p−1} x1_a ; ∂k/∂x_a = p·base^{p−1} x2_a'
        blocks = blocks.at[..., 0, 1:].set(p * bp1[..., None] * x1[..., :, None, :])
        blocks = blocks.at[..., 1:, 0].set(p * bp1[..., None] * x2[..., None, :, :])
        # ∂²k/∂x_a∂x'_b = p(p−1) base^{p−2} x2_a x1_b + p base^{p−1} δ_ab
        cross = p * (p - 1) * bp2[..., None, None] * (
            x2[..., None, :, :, None] * x1[..., :, None, None, :]
        )
        eye_term = p * bp1[..., None, None] * jnp.eye(d, dtype=k.dtype)
        blocks = blocks.at[..., 1:, 1:].set(cross + eye_term)
        if diag:
            n = min(x1.shape[-2], x2.shape[-2])
            idx = jnp.arange(n)
            diag_blocks = blocks[..., idx, idx, :, :]
            return jnp.diagonal(diag_blocks, axis1=-2, axis2=-1).reshape(diag_blocks.shape[:-3] + (n * A,))
        return _interleave_blocks(blocks)
