"""Toeplitz matmul via FFT circulant embedding.

Reference: linear_operator's toeplitz utilities (re-exported at gpytorch/utils/toeplitz.py).
A symmetric Toeplitz matrix T (first column c, length n) embeds in a 2n circulant; T @ v is
then two FFTs — O(n log n), and XLA lowers FFTs natively on TPU.  Gradients w.r.t. the column
come for free through JAX autodiff (the reference needs a hand-written
``toeplitz_derivative_quadratic_form``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sym_toeplitz_matmul(column: jax.Array, rhs: jax.Array) -> jax.Array:
    """T(column) @ rhs with T symmetric Toeplitz.  column: (..., n); rhs: (..., n, k)."""
    squeeze = rhs.ndim == column.ndim
    if squeeze:
        rhs = rhs[..., None]
    n = column.shape[-1]
    # circulant first column: [c_0 .. c_{n-1}, 0, c_{n-1} .. c_1], length 2n
    zero = jnp.zeros(column.shape[:-1] + (1,), dtype=column.dtype)
    c_circ = jnp.concatenate([column, zero, jnp.flip(column[..., 1:], axis=-1)], axis=-1)  # (..., 2n)
    fft_c = jnp.fft.rfft(c_circ, axis=-1)  # (..., n+1); preserves f64 on CPU tests
    rhs_pad = jnp.concatenate([rhs, jnp.zeros_like(rhs)], axis=-2)  # (..., 2n, k)
    fft_rhs = jnp.fft.rfft(rhs_pad, axis=-2)
    prod = fft_c[..., :, None] * fft_rhs
    out = jnp.fft.irfft(prod, n=2 * n, axis=-2)[..., :n, :]
    out = out.astype(rhs.dtype)
    return out[..., 0] if squeeze else out
