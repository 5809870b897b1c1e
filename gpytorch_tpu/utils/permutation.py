"""Reference import-path shim: ``gpytorch.utils.permutation`` (reference:
utils/permutation.py forwards to linear_operator.utils.permutation)."""

import jax.numpy as jnp


def apply_permutation(matrix, left_permutation=None, right_permutation=None):
    """matrix[..., left_permutation, :][..., :, right_permutation] for dense or lazy input."""
    from ..linop import to_dense

    m = to_dense(matrix)
    if left_permutation is not None:
        m = jnp.take(m, left_permutation, axis=-2)
    if right_permutation is not None:
        m = jnp.take(m, right_permutation, axis=-1)
    return m


def inverse_permutation(permutation):
    perm = jnp.asarray(permutation)
    return jnp.zeros_like(perm).at[perm].set(jnp.arange(perm.shape[-1], dtype=perm.dtype))


__all__ = ["apply_permutation", "inverse_permutation"]
