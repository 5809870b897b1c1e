"""Shipped reusable test harness — base case (reference: gpytorch/test/base_test_case.py:12).

Public API for downstream libraries (the reference's is consumed by BoTorch): subclass,
set a class-level ``seed``, and use ``assertAllClose`` with the reference's default
tolerances (rtol 1e-4, atol 1e-5) and max-rtol/atol failure diagnostics.

JAX notes: randomness is key-based, so instead of a global seed the harness provides
``self.key()`` — a deterministic per-test PRNG stream derived from the class seed and the
running call count (reset per test by pytest's fresh-instance collection).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class BaseTestCase:
    seed = 0

    def key(self) -> jax.Array:
        """Deterministic per-call PRNG key derived from the class seed."""
        count = getattr(self, "_key_count", 0)
        self._key_count = count + 1
        return jax.random.fold_in(jax.random.PRNGKey(type(self).seed), count)

    # -- assertions (reference base_test_case.py:27-51) ------------------------------------
    def assertAllClose(self, t1, t2, rtol: float = 1e-4, atol: float = 1e-5, equal_nan: bool = False):
        t1 = np.asarray(t1)
        t2 = np.asarray(t2)
        if t1.shape != t2.shape:
            raise ValueError(f"tensor1 {t1.shape} and tensor2 {t2.shape} do not have the same shape.")
        if np.allclose(t1, t2, rtol=rtol, atol=atol, equal_nan=equal_nan):
            return True
        if not equal_nan:
            if np.isnan(t1).any():
                raise AssertionError(f"tensor1 ({t1.shape}) contains NaNs")
            if np.isnan(t2).any():
                raise AssertionError(f"tensor2 ({t2.shape}) contains NaNs")
        with np.errstate(divide="ignore", invalid="ignore"):
            rtol_diff = (np.abs(t1 - t2) / np.abs(t2)).reshape(-1)
        rtol_max = np.max(rtol_diff[np.isfinite(rtol_diff)], initial=0.0)
        atol_diff = (np.abs(t1 - t2) - np.abs(t2) * rtol).reshape(-1)
        atol_max = np.max(atol_diff[np.isfinite(atol_diff)], initial=0.0)
        raise AssertionError(
            f"tensor1 ({t1.shape}) and tensor2 ({t2.shape}) are not close enough. \n"
            f"max rtol: {rtol_max:0.8f}\t\tmax atol: {atol_max:0.8f}"
        )

    def assertEqual(self, a, b):
        if isinstance(a, (jax.Array, np.ndarray)) or isinstance(b, (jax.Array, np.ndarray)):
            assert np.array_equal(np.asarray(a), np.asarray(b)), f"{a} != {b}"
        else:
            assert a == b, f"{a} != {b}"

    def assertLess(self, a, b):
        assert a < b, f"{a} is not less than {b}"

    def _default_dtype(self, dtype):
        if dtype is not None:
            return dtype
        return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    def randn(self, *shape, dtype=None) -> jax.Array:
        return jax.random.normal(self.key(), shape, dtype=self._default_dtype(dtype))

    def rand(self, *shape, dtype=None) -> jax.Array:
        return jax.random.uniform(self.key(), shape, dtype=self._default_dtype(dtype))
