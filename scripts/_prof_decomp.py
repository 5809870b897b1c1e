"""Round-5 decomposition of the ~34 ms forward residual and ~42 ms non-kernel backward.

All programs jitted, timed best-of-3 with one sync (each timing pays one ~35 ms tunnel
RTT — compare DIFFERENCES).  N=100k, d=3, t=64 (1 rhs + 63 probes), flagship 'high' tiles.

  matvec_chain8_s   — 8 dependent fused matvecs (+noise axpy), no CG bookkeeping
  matvec_wood8_s    — same + a rank-50 whitened-Woodbury apply between each
  cg7_full_s        — real linear_cg, warm rhs + fresh probes, NTRI=7 floor (the
                       flagship forward solve exactly: conv_cols=1, x0)
  cg7_nowarm_s      — same without x0 (7 matvecs, no warm-residual matvec)
  bwdrep_full_s     — replica of the mBCG backward scalar: grad of
                       −g_iq·sᵀK̂s + g_ld·mean(n²·ŝᵀK̂ẑ) wrt hypers (dv skipped)
  bwdrep_quad_s     — quad term only
  bwdrep_est_s      — est term only

Usage: python scripts/_prof_decomp.py [N]
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


def timeit(tag, fn, *a, reps=3):
    sync(fn(*a))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*a))
        best = min(best, time.perf_counter() - t0)
    print(f'{{"{tag}": {best:.4f}}}', flush=True)


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    d, t, k = 3, 64, 50
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (N, d), jnp.float32)
    ls = jnp.array([0.45, 0.5, 0.45], jnp.float32)
    outputscale = jnp.float32(0.8)
    noise = jnp.float32(0.05)
    v = jax.random.normal(jax.random.PRNGKey(1), (N, t), jnp.float32)
    # stand-in Woodbury factor (same shapes as the rank-50 preconditioner)
    Ud = jax.random.normal(jax.random.PRNGKey(2), (N, k), jnp.float32) * 1e-2
    coef = jnp.linspace(0.1, 0.9, k).astype(jnp.float32)
    dinv = jnp.full((N,), 19.0, jnp.float32)

    def kmv(vv, xs):
        return outputscale * pk.fused_kernel_matvec(xs, xs, vv, pk.RBF) + noise * vv

    def wood(vv):
        u = jnp.matmul(Ud.T, vv, precision=jax.lax.Precision.HIGHEST)
        return vv * dinv[:, None] - jnp.matmul(Ud, coef[:, None] * u, precision=jax.lax.Precision.HIGHEST)

    with gp.settings.kernel_matvec_high(True):
        def chain8(vv):
            xs = x / ls
            for _ in range(8):
                vv = kmv(vv, xs)
                vv = vv / jnp.max(jnp.abs(vv))  # keep finite
            return vv

        def chainwood8(vv):
            xs = x / ls
            for _ in range(8):
                vv = wood(kmv(vv, xs))
                vv = vv / jnp.max(jnp.abs(vv))
            return vv

        timeit("matvec_chain8_s", jax.jit(chain8), v)
        timeit("matvec_wood8_s", jax.jit(chainwood8), v)

        from gpytorch_tpu.solvers.cg import linear_cg

        b = jax.random.normal(jax.random.PRNGKey(3), (N, t), jnp.float32)
        x0 = b.at[:, 1:].set(0.0) * 0.1

        def cg_run(bb, x0_):
            xs = x / ls
            res = linear_cg(
                lambda vv: kmv(vv, xs), bb, precond_fn=wood, max_iter=100,
                tolerance=1.0, n_tridiag_iter=7, x0=x0_, conv_cols=1,
            )
            return res.solution, res.alphas, res.betas

        timeit("cg7_full_s", jax.jit(lambda bb: cg_run(bb, x0)), b)
        timeit("cg7_nowarm_s", jax.jit(lambda bb: cg_run(bb, None)), b)

        # -- backward replica (shapes of the real _mbcg_bwd scalar_fn, dv skipped) -------
        s_rhs = jax.random.normal(jax.random.PRNGKey(4), (N, 1), jnp.float32)
        sp = jax.random.normal(jax.random.PRNGKey(5), (N, t - 1), jnp.float32)
        pz = jax.random.normal(jax.random.PRNGKey(6), (N, t - 1), jnp.float32)
        norms2 = jnp.abs(jax.random.normal(jax.random.PRNGKey(7), (t - 1,))).astype(jnp.float32)
        g_iq, g_ld = jnp.float32(1.0), jnp.float32(1.0)

        def scalar(hyp, use_quad=True, use_est=True):
            ls_, os_, noise_ = hyp
            xs = x / ls_
            cols = jnp.concatenate([s_rhs, pz], axis=-1)
            K_all = os_ * pk.fused_kernel_matvec(xs, xs, cols, pk.RBF) + noise_ * cols
            total = jnp.zeros((), jnp.float32)
            if use_quad:
                total = total - g_iq * jnp.sum(s_rhs * K_all[:, :1])
            if use_est:
                est = jnp.mean(norms2 * jnp.sum(sp * K_all[:, 1:], axis=0))
                total = total + g_ld * est
            return total

        hyp = (ls, outputscale, noise)
        with gp.settings.skip_matvec_cotangent(True):
            timeit("bwdrep_full_s", jax.jit(jax.grad(scalar)), hyp)
            timeit("bwdrep_quad_s", jax.jit(jax.grad(lambda h: scalar(h, use_est=False))), hyp)
            timeit("bwdrep_est_s", jax.jit(jax.grad(lambda h: scalar(h, use_quad=False))), hyp)
    print("PROF_DECOMP DONE", flush=True)


if __name__ == "__main__":
    main()
