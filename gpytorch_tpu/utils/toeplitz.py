"""Reference import-path shim: ``gpytorch.utils.toeplitz`` (reference: utils/toeplitz.py
forwards to linear_operator.utils.toeplitz)."""

import jax.numpy as jnp

from ..ops.toeplitz import sym_toeplitz_matmul


def toeplitz_matmul(toeplitz_column, toeplitz_row, tensor):
    """General (column, row)-defined Toeplitz matmul via the circulant-FFT kernel."""
    import jax.numpy as jnp

    n = toeplitz_column.shape[-1]
    # embed in a symmetric-free circulant: first column [c, 0, reversed(r[1:])]
    circ = jnp.concatenate(
        [toeplitz_column, jnp.zeros_like(toeplitz_column[..., :1]), jnp.flip(toeplitz_row[..., 1:], axis=-1)],
        axis=-1,
    )
    fc = jnp.fft.rfft(circ, axis=-1)
    pad = jnp.concatenate([tensor, jnp.zeros_like(tensor)[..., :n, :][..., : circ.shape[-1] - n, :]], axis=-2)
    fv = jnp.fft.rfft(pad, axis=-2)
    out = jnp.fft.irfft(fc[..., :, None] * fv, n=circ.shape[-1], axis=-2)
    return out[..., :n, :]


def sym_toeplitz_derivative_quadratic_form(left_vectors, right_vectors):
    """d (lᵀ T r) / d c for symmetric Toeplitz T with first column c (reference name)."""
    import jax.numpy as jnp

    n = left_vectors.shape[-2] if left_vectors.ndim > 1 else left_vectors.shape[-1]
    lv = left_vectors.reshape(n, -1)
    rv = right_vectors.reshape(n, -1)
    # dT/dc_k has ones where |i-j| == k (double-counted at k=0 handled by symmetry)
    idx = jnp.abs(jnp.arange(n)[:, None] - jnp.arange(n)[None, :])
    outer = lv @ rv.T  # (n, n)
    res = jnp.zeros(n, dtype=lv.dtype).at[idx.reshape(-1)].add(outer.reshape(-1))
    return res


__all__ = ["sym_toeplitz_matmul", "toeplitz_matmul", "sym_toeplitz_derivative_quadratic_form"]
