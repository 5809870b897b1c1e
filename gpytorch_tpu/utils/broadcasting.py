"""Reference import-path shim: ``gpytorch.utils.broadcasting`` (reference:
utils/broadcasting.py forwards to linear_operator.utils.broadcasting)."""

import jax.numpy as jnp


def _mul_broadcast_shape(*shapes):
    """Broadcast shapes (the reference's legacy helper; jnp.broadcast_shapes)."""
    return jnp.broadcast_shapes(*shapes)


def _matmul_broadcast_shape(shape_a, shape_b):
    """Result shape of a batched matmul a @ b."""
    batch = jnp.broadcast_shapes(tuple(shape_a[:-2]), tuple(shape_b[:-2]))
    return tuple(batch) + (shape_a[-2], shape_b[-1])


__all__ = ["_mul_broadcast_shape", "_matmul_broadcast_shape"]
