"""Sparse interpolation matvecs for SKI/KISS-GP.

Reference: gpytorch/utils/interpolation.py:170-186 (``left_interp``/``left_t_interp``, which
dispatch to linear_operator's ``dsmm`` sparse·dense matmul).  TPU-native version: the
interpolation matrix W (n × m, q=4^d nonzeros per row) is stored as (indices, values) and
applied with gathers (W @ ·) and segment-sum scatter-adds (Wᵀ @ ·) — both lower to efficient
XLA gather/scatter on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def left_interp(indices: jax.Array, values: jax.Array, rhs: jax.Array) -> jax.Array:
    """W @ rhs where W[i, indices[i, q]] = values[i, q].

    indices: (*b, n, q) int; values: (*b, n, q); rhs: (*b, m, k) → (*b, n, k).
    """
    if rhs.ndim == 1:
        return left_interp(indices, values, rhs[:, None])[..., 0]
    batch = jnp.broadcast_shapes(indices.shape[:-2], values.shape[:-2], rhs.shape[:-2])
    indices = jnp.broadcast_to(indices, batch + indices.shape[-2:])
    values = jnp.broadcast_to(values, batch + values.shape[-2:])
    rhs = jnp.broadcast_to(rhs, batch + rhs.shape[-2:])

    def _single(idx, val, r):
        gathered = jnp.take(r, idx, axis=0)  # (n, q, k)
        return jnp.sum(gathered * val[..., None], axis=1)

    fn = _single
    for _ in range(len(batch)):
        fn = jax.vmap(fn)
    return fn(indices, values, rhs)


def left_t_interp(indices: jax.Array, values: jax.Array, rhs: jax.Array, output_dim: int) -> jax.Array:
    """Wᵀ @ rhs: (*b, n, k) → (*b, m, k) via scatter-add."""
    if rhs.ndim == 1:
        return left_t_interp(indices, values, rhs[:, None], output_dim)[..., 0]
    batch = jnp.broadcast_shapes(indices.shape[:-2], values.shape[:-2], rhs.shape[:-2])
    indices = jnp.broadcast_to(indices, batch + indices.shape[-2:])
    values = jnp.broadcast_to(values, batch + values.shape[-2:])
    rhs = jnp.broadcast_to(rhs, batch + rhs.shape[-2:])

    def _single(idx, val, r):
        n, q = idx.shape
        k = r.shape[-1]
        contrib = (val[..., None] * r[:, None, :]).reshape(n * q, k)
        flat_idx = idx.reshape(n * q)
        return jax.ops.segment_sum(contrib, flat_idx, num_segments=output_dim)

    fn = _single
    for _ in range(len(batch)):
        fn = jax.vmap(fn)
    return fn(indices, values, rhs)
