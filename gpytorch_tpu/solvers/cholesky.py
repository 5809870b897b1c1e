"""psd_safe_cholesky — Cholesky with escalating-jitter retry.

Reference: linear_operator's ``psd_safe_cholesky`` (used at
gpytorch/variational/unwhitened_variational_strategy.py:18,59 and everywhere a dense factor is
needed), with ``cholesky_jitter`` / ``cholesky_max_tries`` settings (gpytorch/settings.py).

JAX/TPU notes: ``jnp.linalg.cholesky`` returns NaNs instead of raising on an indefinite input,
so the retry is a chain of ``lax.cond``s keyed on NaN detection — only the needed factorization
executes at runtime, and the whole construct is reverse-mode differentiable.  Unlike the
reference we *always* add the base jitter: on TPU there is no f64 fallback, and the reference
tolerances are still met (its own variational paths also always add jitter).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .. import settings


def psd_safe_cholesky(A: jax.Array, jitter: Optional[float] = None, max_tries: Optional[int] = None) -> jax.Array:
    if jitter is None:
        jitter = settings.cholesky_jitter.value(A.dtype)
    if max_tries is None:
        max_tries = settings.cholesky_max_tries.value()
    n = A.shape[-1]
    eye = jnp.eye(n, dtype=A.dtype)
    if settings.verbose_linalg.on():
        settings.logger.debug(f"Running Cholesky on a matrix of size {A.shape}.")

    L = jnp.linalg.cholesky(A + jitter * eye)
    for i in range(1, int(max_tries) + 1):
        jitter_i = jitter * (10.0 ** i)
        bad = jnp.any(jnp.isnan(L))
        L = jax.lax.cond(
            bad,
            lambda A=A, j=jitter_i: jnp.linalg.cholesky(A + j * eye),
            lambda L=L: L,
        )
    return L
