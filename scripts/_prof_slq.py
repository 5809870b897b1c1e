"""Name the pieces of the ~90 ms 'SLQ/misc forward' bucket (docs/perf-accounting.md):
time jitted micro-programs matching the flagship step's non-matvec forward work.

  * eigh_31x10_s     — batched symmetric eigh of the (31, 10, 10) Lanczos tridiagonals
  * probe_norm_s     — probe normalization rowsums over (100k, 31)
  * cgvec_iter_s     — one CG iteration's vector algebra (axpy/dots) over (100k, 32),
                       WITHOUT the matvec (isolates the 'CG vector ops' share)
  * woodbury_apply_s — rank-50 whitened-eigenspace preconditioner apply on (100k, 32)

Usage: python _prof_slq.py [N]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree_util.tree_reduce(lambda a, b: a + jnp.sum(b), out, 0.0)))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_reduce(lambda a, b: a + jnp.sum(b), out, 0.0)))
    return (time.perf_counter() - t0) / reps


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    t, m, k = 31, 10, 50
    key = jax.random.PRNGKey(0)

    # symmetric tridiagonals with a healthy spectrum
    a = 1.0 + jax.random.uniform(key, (t, m))
    b = 0.3 * jax.random.uniform(jax.random.PRNGKey(1), (t, m - 1))
    T = jnp.zeros((t, m, m))
    T = T.at[..., jnp.arange(m), jnp.arange(m)].set(a)
    T = T.at[..., jnp.arange(m - 1), jnp.arange(m - 1) + 1].set(b)
    T = T.at[..., jnp.arange(m - 1) + 1, jnp.arange(m - 1)].set(b)

    @jax.jit
    def slq_eigh(T):
        lam, V = jnp.linalg.eigh(T)
        lam = jnp.maximum(lam, 1e-8)
        w = V[..., 0, :] ** 2
        return jnp.sum(w * jnp.log(lam), axis=-1)

    print({"eigh_31x10_s": round(timeit(slq_eigh, T), 5)}, flush=True)

    z = jax.random.normal(jax.random.PRNGKey(2), (N, t))

    @jax.jit
    def probe_norm(z):
        norms = jnp.sqrt(jnp.maximum(jnp.sum(z * z, axis=-2), 1e-20))[None, :]
        return z / norms

    print({"probe_norm_s": round(timeit(probe_norm, z), 5)}, flush=True)

    V = jax.random.normal(jax.random.PRNGKey(3), (N, t + 1))

    @jax.jit
    def cg_vec_iter(x, r, p, Kp):
        # one CG iteration's vector algebra at t+1 columns (matvec excluded)
        pKp = jnp.sum(p * Kp, axis=0)
        rs = jnp.sum(r * r, axis=0)
        alpha = rs / jnp.maximum(pKp, 1e-30)
        x = x + alpha * p
        r = r - alpha * Kp
        rs2 = jnp.sum(r * r, axis=0)
        beta = rs2 / jnp.maximum(rs, 1e-30)
        p = r + beta * p
        return x, r, p

    print({"cgvec_iter_s": round(timeit(cg_vec_iter, V, V, V, V), 5)}, flush=True)

    L = jax.random.normal(jax.random.PRNGKey(4), (N, k)) / jnp.sqrt(N)
    dsi = jnp.full((N,), 3.0)
    U = jax.random.normal(jax.random.PRNGKey(5), (N, k)) / jnp.sqrt(N)
    coef = jnp.linspace(0.1, 0.9, k)

    @jax.jit
    def woodbury(v):
        w = v * dsi[:, None]
        u = U.T @ w
        out = w - U @ (coef[:, None] * u)
        return out * dsi[:, None]

    print({"woodbury_apply_s": round(timeit(woodbury, V), 5)}, flush=True)


if __name__ == "__main__":
    main()
