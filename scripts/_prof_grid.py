"""Grid/tile sweep for the fused high-mode matvec, measured IN-PROGRAM (chain of 4
dependent matvecs / 4 — the cost that the CG loop actually pays; standalone best-of
timings over-credit the tunnel RTT).  Sweeps (_BN, _BM, n_sub) combos that plausibly fit
the 16 MB VMEM budget in high mode.

Usage: python scripts/_prof_grid.py [N]
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
    return float(jnp.sum(jnp.asarray(v, jnp.float32)))


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    d, t = 3, 64
    x = jax.random.uniform(jax.random.PRNGKey(0), (N, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(1), (N, t), jnp.float32)

    combos = [
        (1024, 2048, 2),   # shipped default
        (1024, 2048, 4),
        (2048, 2048, 4),
        (2048, 4096, 8),
        (1024, 4096, 4),
        (512, 2048, 2),
        (1024, 1024, 2),
        (2048, 1024, 2),
    ]
    for bn, bm, nsub in combos:
        pk._BN, pk._BM, pk._NSUB_OVERRIDE = bn, bm, nsub

        def chain(v):
            out = v
            for _ in range(4):
                out = pk._matvec_pallas(x, x, out, pk.RBF) * jnp.float32(1e-4)
            return jnp.sum(out)

        tag = f"mv4_bn{bn}_bm{bm}_s{nsub}"
        try:
            with gp.settings.kernel_matvec_high(True):
                f = jax.jit(chain)
                sync(f(v))
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    sync(f(v))
                    best = min(best, time.perf_counter() - t0)
            print(f'{{"{tag}": {best:.4f}}}', flush=True)
        except Exception as e:
            print(f'{{"{tag}": "FAIL: {type(e).__name__}: {str(e)[:90]}"}}', flush=True)
    pk._BN, pk._BM, pk._NSUB_OVERRIDE = 1024, 2048, None
    print("PROF_GRID DONE", flush=True)


if __name__ == "__main__":
    main()
