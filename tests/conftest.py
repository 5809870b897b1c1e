"""Test configuration: force CPU with an 8-device virtual mesh (the axon TPU plugin
overrides JAX_PLATFORMS, so this must run before jax is first used)."""

import os

os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
# The reference test-suite tolerances (rtol 1e-4) assume f64; CPU tests run in f64 while the
# TPU bench path runs f32/bf16.
jax.config.update("jax_enable_x64", True)
