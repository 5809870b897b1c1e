"""Sharded mBCG over an 8-device virtual CPU mesh (conftest forces
xla_force_host_platform_device_count=8) — the deterministic multi-device CI the reference
never had (SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

import gpytorch_tpu as gp
from gpytorch_tpu.distributed import ShardedMBCGConfig, sharded_exact_gp_mll, sharded_posterior_mean
from gpytorch_tpu.ops import pallas_kernels as pk


def _mesh():
    devs = np.array(jax.devices())
    assert len(devs) == 8, f"expected 8 virtual devices, got {len(devs)}"
    return Mesh(devs, ("data",))


def _dense_mll(x, y, ls, os_, noise, mean):
    n = x.shape[0]
    xs = x / ls
    d2 = jnp.sum(xs**2, 1)[:, None] - 2 * xs @ xs.T + jnp.sum(xs**2, 1)[None, :]
    K = os_ * jnp.exp(-0.5 * jnp.maximum(d2, 0)) + noise * jnp.eye(n)
    diff = y - mean
    sol = jnp.linalg.solve(K, diff)
    _, ld = jnp.linalg.slogdet(K)
    return 0.5 * (diff @ sol + ld + n * jnp.log(2 * jnp.pi)) / n


def test_sharded_mll_matches_dense():
    mesh = _mesh()
    key = jax.random.PRNGKey(0)
    n = 512
    x = jax.random.normal(key, (n, 3))
    y = jnp.sin(x[:, 0]) + 0.1 * jax.random.normal(jax.random.PRNGKey(1), (n,))
    ls, os_, noise, mean = jnp.asarray(0.9), jnp.asarray(1.2), jnp.asarray(0.05), jnp.asarray(0.1)
    # 24 probes / 25 tridiag easily clears the 5% gate at n=512; heavier budgets only add runtime
    cfg = ShardedMBCGConfig(num_probes=24, max_cg_iters=150, cg_tolerance=1e-8, n_tridiag_iter=25)
    loss = sharded_exact_gp_mll(mesh, x, y, ls, os_, noise, mean, cfg)
    dense = _dense_mll(x, y, ls, os_, noise, mean)
    assert abs(float(loss) - float(dense)) / abs(float(dense)) < 0.05, (float(loss), float(dense))


def test_sharded_mll_gradients_match_dense():
    mesh = _mesh()
    key = jax.random.PRNGKey(2)
    n = 256
    x = jax.random.normal(key, (n, 2))
    y = jnp.sin(x[:, 0] * 2) + 0.1 * jax.random.normal(jax.random.PRNGKey(3), (n,))
    # rtol 0.2 on the SLQ-driven grads needs ~dozens of probes, not 128
    cfg = ShardedMBCGConfig(num_probes=48, max_cg_iters=200, cg_tolerance=1e-9, n_tridiag_iter=30)

    def sharded_loss(p):
        ls, os_, noise, mean = p
        return sharded_exact_gp_mll(mesh, x, y, ls, os_, noise, mean, cfg)

    def dense_loss(p):
        ls, os_, noise, mean = p
        return _dense_mll(x, y, ls, os_, noise, mean)

    p0 = (jnp.asarray(0.8), jnp.asarray(1.0), jnp.asarray(0.1), jnp.asarray(0.05))
    g_sharded = jax.grad(sharded_loss)(p0)
    g_dense = jax.grad(dense_loss)(p0)
    for gs, gd, name in zip(g_sharded, g_dense, ["ls", "os", "noise", "mean"]):
        np.testing.assert_allclose(
            np.asarray(gs), np.asarray(gd), rtol=0.2, atol=0.02,
            err_msg=f"sharded grad mismatch for {name}",
        )


def test_sharded_posterior_mean_matches_dense():
    mesh = _mesh()
    key = jax.random.PRNGKey(4)
    n = 256
    x = jax.random.normal(key, (n, 2))
    y = jnp.sin(x[:, 0] * 2)
    test_x = jax.random.normal(jax.random.PRNGKey(5), (16, 2))
    ls, os_, noise, mean = jnp.asarray(0.7), jnp.asarray(1.0), jnp.asarray(0.01), jnp.asarray(0.0)
    cfg = ShardedMBCGConfig(max_cg_iters=200, cg_tolerance=1e-9)
    post = sharded_posterior_mean(mesh, x, y, test_x, ls, os_, noise, mean, cfg)

    xs = x / ls
    ts = test_x / ls
    d2 = lambda a, b: jnp.sum(a**2, 1)[:, None] - 2 * a @ b.T + jnp.sum(b**2, 1)[None, :]
    K = os_ * jnp.exp(-0.5 * jnp.maximum(d2(xs, xs), 0)) + noise * jnp.eye(n)
    Kst = os_ * jnp.exp(-0.5 * jnp.maximum(d2(ts, xs), 0))
    dense_post = Kst @ jnp.linalg.solve(K, y - mean) + mean
    np.testing.assert_allclose(np.asarray(post), np.asarray(dense_post), atol=5e-3)
