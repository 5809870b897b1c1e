"""Pairwise distance ops with the mean-centering stability trick.

Reference: gpytorch/kernels/kernel.py:26-52 (``sq_dist``/``dist``): centre both inputs by
x1's mean before the quadratic expansion ‖a−b‖² = ‖a‖² − 2a·b + ‖b‖², which keeps the
cancellation error small in f32 — essential on TPU where f64 is unavailable.

The expansion form keeps the O(N²d) work in a single MXU matmul instead of the O(N²d)
VPU-bound broadcast-subtract that a naive implementation would use.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sq_dist(x1: jax.Array, x2: jax.Array, x1_eq_x2: bool = False) -> jax.Array:
    """Squared Euclidean distance matrix, shape (..., n, m) for inputs (..., n, d), (..., m, d)."""
    adjustment = jnp.mean(x1, axis=-2, keepdims=True)
    x1 = x1 - adjustment
    x2 = x2 - adjustment
    x1_norm = jnp.sum(x1 * x1, axis=-1, keepdims=True)
    x2_norm = jnp.sum(x2 * x2, axis=-1, keepdims=True)
    x1_pad = jnp.ones_like(x1_norm)
    x2_pad = jnp.ones_like(x2_norm)
    x1_ = jnp.concatenate([-2.0 * x1, x1_norm, x1_pad], axis=-1)
    x2_ = jnp.concatenate([x2, x2_pad, x2_norm], axis=-1)
    # Precision.HIGHEST: TPU matmuls default to one-pass bf16 input rounding, which breaks
    # PSD-ness of the kernel matrix; distances are accuracy-critical (cholesky downstream).
    res = jnp.matmul(
        x1_,
        jnp.swapaxes(x2_, -1, -2),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(x1.dtype)
    if x1_eq_x2:
        n = res.shape[-1]
        res = res * (1.0 - jnp.eye(n, dtype=res.dtype))
    return jnp.maximum(res, 0.0)


def dist(x1: jax.Array, x2: jax.Array, x1_eq_x2: bool = False) -> jax.Array:
    """Euclidean distance matrix (reference: kernel.py:52)."""
    res = sq_dist(x1, x2, x1_eq_x2=x1_eq_x2)
    res = jnp.sqrt(jnp.maximum(res, 1e-30))
    if x1_eq_x2:
        n = res.shape[-1]
        res = res * (1.0 - jnp.eye(n, dtype=res.dtype))
    return res
