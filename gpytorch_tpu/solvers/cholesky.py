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
    # linalg-dtype promotion (reference: linear_operator linalg_dtypes, default double) —
    # resolves to None on TPU/f32-only runtimes, where iterative refinement is the substitute
    out_dtype = A.dtype
    promote = settings._linalg_dtype_cholesky.dtype()
    if promote is not None and jnp.dtype(promote) != jnp.dtype(A.dtype) and jnp.issubdtype(A.dtype, jnp.floating):
        if jnp.finfo(promote).bits > jnp.finfo(A.dtype).bits:
            L = psd_safe_cholesky(A.astype(promote), jitter=jitter, max_tries=max_tries)
            return L.astype(out_dtype)
    if jitter is None:
        jitter = settings.cholesky_jitter.value(A.dtype)
    if max_tries is None:
        max_tries = settings.cholesky_max_tries.value()
    settings._count_call("psd_safe_cholesky")
    n = A.shape[-1]
    eye = jnp.eye(n, dtype=A.dtype)
    if settings.verbose_linalg.on():
        settings.logger.debug(f"Running Cholesky on a matrix of size {A.shape}.")

    # Select the jitter level on a stop-gradient copy: a failed attempt yields NaN, and the
    # VJP of an unused NaN-producing branch is NaN (0·NaN) — so no differentiable Cholesky
    # may ever fail.  The final (single) differentiable factorization uses the jitter level
    # that was verified to succeed.
    A_sg = jax.lax.stop_gradient(A)
    L_probe = jnp.linalg.cholesky(A_sg + jitter * eye)
    level = jnp.zeros((), dtype=A.dtype)
    for i in range(1, int(max_tries) + 1):
        bad = jnp.any(jnp.isnan(L_probe))
        level = jnp.where(bad, jnp.asarray(float(i), dtype=A.dtype), level)
        L_probe = jax.lax.cond(
            bad,
            lambda A_sg=A_sg, j=jitter * (10.0 ** i): jnp.linalg.cholesky(A_sg + j * eye),
            lambda L_probe=L_probe: L_probe,
        )
    jitter_sel = jitter * (10.0 ** level)
    return jnp.linalg.cholesky(A + jitter_sel * eye)
