"""Round-5 kernel timings: fused backward WITH vs WITHOUT the dv product
(settings.skip_matvec_cotangent), plus matvec, at the flagship column widths.

Usage: python scripts/_prof_bwd3.py [N]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import time

import jax
import jax.numpy as jnp

import gpytorch_tpu as gp
from gpytorch_tpu.ops import pallas_kernels as pk


def sync(v):
    return float(jnp.sum(jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(jnp.asarray(b, jnp.float32)), v, 0.0)))


def timeit(tag, fn, *a, reps=4):
    sync(fn(*a))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*a))
        best = min(best, time.perf_counter() - t0)
    print(f'{{"{tag}": {best:.4f}}}', flush=True)


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    x = jax.random.uniform(jax.random.PRNGKey(0), (N, 3), jnp.float32)
    for t in (32, 64):
        g = jax.random.normal(jax.random.PRNGKey(1), (N, t), jnp.float32)
        v = jax.random.normal(jax.random.PRNGKey(2), (N, t), jnp.float32)
        with gp.settings.kernel_matvec_high(True):
            timeit(f"matvec_high_t{t}_s", jax.jit(lambda v: pk._matvec_pallas(x, x, v, pk.RBF)), v)
            timeit(f"bwd_dv_t{t}_s",
                   jax.jit(lambda g, v: pk._bwd_fused_pallas(x, g, v, pk.RBF, need_dv=True)[:2]), g, v)
            timeit(f"bwd_nodv_t{t}_s",
                   jax.jit(lambda g, v: pk._bwd_fused_pallas(x, g, v, pk.RBF, need_dv=False)[1]), g, v)
            timeit(f"bwd_nodv_dos_t{t}_s",
                   jax.jit(lambda g, v: pk._bwd_fused_pallas(x, g, v, pk.RBF, need_dv=False,
                                                             need_dos=True)[1:]), g, v)
    print("PROF_BWD3 DONE", flush=True)


if __name__ == "__main__":
    main()
# (appended r5) quick dos-cost check: python scripts/_prof_bwd3.py dos
