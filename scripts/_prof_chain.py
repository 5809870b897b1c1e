"""Why does an in-program matvec cost ~35 ms when the standalone program costs 26 ms?
(round-5 decomp: matvec_chain8_s = 0.316 vs 8×26 ms + RTT = 0.243 expected)

Hypotheses, each isolated:
  chain8_dep_s      — 8 DEPENDENT matvecs (the CG pattern), constant rescale between
  chain8_indep_s    — 8 INDEPENDENT matvecs in one program (no data dependency)
  chain8_pad0_s     — 8 dependent matvecs at N=102400 (=_BN multiple) and t=128
                      (=_LANE): every pad/slice copy around the pallas call is a no-op
  matvec1_pad0_s    — single matvec at the pad-free shape (reference point)
  chain8_t128_s     — dependent, N=100k, t=128 (lane-pad-free, row pads remain)

Usage: python scripts/_prof_chain.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

import gpytorch_tpu as gp
from gpytorch_tpu.ops import pallas_kernels as pk


def sync(v):
    return float(jnp.sum(jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(jnp.asarray(b, jnp.float32)), v, 0.0)))


def timeit(tag, fn, *a, reps=3):
    sync(fn(*a))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*a))
        best = min(best, time.perf_counter() - t0)
    print(f'{{"{tag}": {best:.4f}}}', flush=True)


def main():
    d = 3
    with gp.settings.kernel_matvec_high(True):
        for (N, t, tag) in [(100_000, 64, "dep"), (100_000, 64, "indep"),
                            (102_400, 128, "pad0"), (102_400, 128, "one_pad0"),
                            (100_000, 128, "t128")]:
            x = jax.random.uniform(jax.random.PRNGKey(0), (N, d), jnp.float32)
            v = jax.random.normal(jax.random.PRNGKey(1), (N, t), jnp.float32)
            if tag == "indep":
                vs = jax.random.normal(jax.random.PRNGKey(2), (8, N, t), jnp.float32)

                def indep(vs):
                    return sum(jnp.sum(pk._matvec_pallas(x, x, vs[i], pk.RBF)) for i in range(8))

                timeit("chain8_indep_s", jax.jit(indep), vs)
                continue
            if tag == "one_pad0":
                timeit("matvec1_pad0_s", jax.jit(lambda v: pk._matvec_pallas(x, x, v, pk.RBF)), v)
                continue

            def dep(v):
                for _ in range(8):
                    v = pk._matvec_pallas(x, x, v, pk.RBF) * jnp.float32(1e-4)
                return v

            timeit(f"chain8_{tag}_s", jax.jit(dep), v)

        # -- backward-replica ablations: which cotangent keeps the primal matvec alive? --
        N, t = 100_000, 64
        x = jax.random.uniform(jax.random.PRNGKey(0), (N, d), jnp.float32)
        ls = jnp.array([0.45, 0.5, 0.45], jnp.float32)
        os_ = jnp.float32(0.8)
        noise = jnp.float32(0.05)
        s_rhs = jax.random.normal(jax.random.PRNGKey(4), (N, 1), jnp.float32)
        pz = jax.random.normal(jax.random.PRNGKey(6), (N, t - 1), jnp.float32)
        cols = jnp.concatenate([s_rhs, pz], axis=-1)
        norms2 = jnp.abs(jax.random.normal(jax.random.PRNGKey(7), (t - 1,))).astype(jnp.float32)

        def scalar(ls_, os__, noise_):
            xs = x / ls_
            K_all = os__ * pk.fused_kernel_matvec(xs, xs, cols, pk.RBF) + noise_ * cols
            est = jnp.mean(norms2 * jnp.sum(pz * K_all[:, 1:], axis=0))
            return -jnp.sum(s_rhs * K_all[:, :1]) + est

        with gp.settings.skip_matvec_cotangent(True):
            # grad wrt (ls, os, noise): the os cotangent needs the PRIMAL unscaled matvec
            timeit("bwdrep_all_s", jax.jit(jax.grad(scalar, argnums=(0, 1, 2))), ls, os_, noise)
            # grad wrt ls only: primal should be DCE-able -> expect ~kernel-only cost
            timeit("bwdrep_lsonly_s", jax.jit(jax.grad(scalar, argnums=0)), ls, os_, noise)
            # grad wrt os only: no fused bwd kernel, but the primal matvec must run
            timeit("bwdrep_osonly_s", jax.jit(jax.grad(scalar, argnums=1)), ls, os_, noise)
    print("PROF_CHAIN DONE", flush=True)


if __name__ == "__main__":
    main()
