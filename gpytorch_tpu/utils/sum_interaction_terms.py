"""Newton–Girard additive-kernel helper (reference: gpytorch/utils/sum_interaction_terms.py:9).

Computes Σ_{degree k ≤ max_degree} e_k(Z) where e_k are the elementary symmetric polynomials
of per-dimension kernel evaluations Z stacked on ``dim`` — the sum of all interaction terms
up to order ``max_degree``, via the Newton–Girard power-sum recurrences (O(D·max_degree)
instead of the 2^D naive expansion).  The public helper behind
``NewtonGirardAdditiveKernel``."""

from __future__ import annotations

import jax.numpy as jnp


def sum_interaction_terms(Z, max_degree: int, dim: int = -3):
    """Z: per-dim values stacked on ``dim``; returns Σ_{k=1..max_degree} e_k(Z)."""
    D = Z.shape[dim]
    max_degree = int(min(max_degree, D))
    ps = [None] + [jnp.sum(Z**k, axis=dim) for k in range(1, max_degree + 1)]
    e = [jnp.ones_like(ps[1])]
    for k in range(1, max_degree + 1):
        acc = jnp.zeros_like(ps[1])
        for i in range(1, k + 1):
            acc = acc + ((-1.0) ** (i - 1)) * e[k - i] * ps[i]
        e.append(acc / k)
    out = jnp.zeros_like(e[1])
    for k in range(1, max_degree + 1):
        out = out + e[k]
    return out
