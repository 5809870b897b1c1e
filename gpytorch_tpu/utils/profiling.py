"""Profiling hooks (SURVEY §5: the reference has no built-in profiler; the TPU-native
equivalents are ``settings.verbose_linalg`` CG statistics plus the JAX xplane profiler).

``profile_trace`` wraps ``jax.profiler.trace`` so a training loop can be captured for
TensorBoard/xprof with one context manager:

    with gpytorch_tpu.utils.profiling.profile_trace("/tmp/gp-trace"):
        for _ in range(10):
            params, state, loss = step(params, state, key)
        loss.block_until_ready()

``annotate`` names a region inside jitted code (shows up on the xplane timeline).
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str, create_perfetto_link: bool = False):
    """Capture a device/host trace viewable in TensorBoard's profile plugin."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region (jax.profiler.TraceAnnotation) for the xplane timeline."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats() -> dict:
    """Per-device memory statistics (bytes in use / peak / limit) where the backend
    exposes them; {} on backends without memory_stats."""
    stats = {}
    for d in jax.devices():
        ms = getattr(d, "memory_stats", None)
        try:
            m = ms() if callable(ms) else None
        except Exception:
            m = None
        if m:
            stats[str(d)] = {
                "bytes_in_use": m.get("bytes_in_use"),
                "peak_bytes_in_use": m.get("peak_bytes_in_use"),
                "bytes_limit": m.get("bytes_limit"),
            }
    return stats
