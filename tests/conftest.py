"""Test configuration: force CPU with an 8-device virtual mesh (the axon TPU plugin
overrides JAX_PLATFORMS, so this must run before jax is first used)."""

import os

os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
# The reference test-suite tolerances (rtol 1e-4) assume f64; CPU tests run in f64 while the
# TPU bench path runs f32/bf16.
jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: the suite is compile-bound on CPU (hundreds of distinct
# jit programs); re-runs hit the disk cache instead of re-lowering.
_cache_dir = os.environ.get("GPYTORCH_TPU_JIT_CACHE", "/tmp/gpytorch_tpu_jit_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
