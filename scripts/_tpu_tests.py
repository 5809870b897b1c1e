"""Real-chip test battery (VERDICT r4 ask #6: TPU-only tests must run every round).

Runs ON the actual TPU (no CPU forcing, no interpret mode): fused-kernel forward/backward
parity vs the dense jnp reference, the dv-skip cotangent identity, a LOVE serving smoke,
and a short training-loss smoke.  Prints one JSON line per check plus a final summary
line {"tpu_tests": {"passed": N, "failed": M}} consumed by scripts/run_tpu_tests.sh.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json
import time
import traceback

import jax
import jax.numpy as jnp

RESULTS = []


def check(name):
    def deco(fn):
        RESULTS.append((name, fn))
        return fn

    return deco


@check("backend_is_tpu")
def _backend():
    b = jax.default_backend()
    assert b in ("tpu", "axon"), b
    return {"backend": b, "device": str(jax.devices()[0])}


def _data(n, d=3, seed=0):
    x = jax.random.uniform(jax.random.PRNGKey(seed), (n, d), dtype=jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(seed + 1), (n, 8), dtype=jnp.float32)
    return x, v


@check("fused_matvec_parity_high")
def _fwd_parity():
    # high-mode (3-pass hi/lo) fused streaming matvec vs dense f32 reference, all kernels
    import gpytorch_tpu as gp
    from gpytorch_tpu.ops import pallas_kernels as pk

    x, v = _data(4096)
    out = {}
    for kt, name in [(0, "rbf"), (1, "matern12"), (2, "matern32"), (3, "matern52")]:
        with gp.settings.kernel_matvec_high(True):
            got = pk.fused_kernel_matvec(x, x, v, kt)
        want = pk._matvec_reference(x, x, v, kt)
        rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
        assert rel < 1e-4, (name, rel)
        out[name] = rel
    return out


@check("fused_backward_parity_and_dv_skip")
def _bwd_parity():
    # fused one-tile backward (dv, dx) vs the jnp reference VJP; and the dv-skip variant's
    # dx must match the full variant bit-for-bit (same tile program minus the dv product)
    import gpytorch_tpu as gp
    from gpytorch_tpu.ops import pallas_kernels as pk

    x, v = _data(2048)
    g = jax.random.normal(jax.random.PRNGKey(9), v.shape, dtype=jnp.float32)
    out = {}
    for kt in (0, 3):
        with gp.settings.kernel_matvec_high(True):
            dv, dx, _ = pk._bwd_fused_pallas(x, g, v, kt)
            dv2, dx2, _ = pk._bwd_fused_pallas(x, g, v, kt, need_dv=False)
        assert dv2 is None

        def f(xx, vv):
            return jnp.sum(g * pk._matvec_reference(xx, xx, vv, kt))

        rdx, rdv = jax.grad(f, argnums=(0, 1))(x, v)
        rel_dx = float(jnp.linalg.norm(dx - rdx) / (jnp.linalg.norm(rdx) + 1e-30))
        rel_dv = float(jnp.linalg.norm(dv - rdv) / (jnp.linalg.norm(rdv) + 1e-30))
        rel_skip = float(jnp.linalg.norm(dx2 - dx) / (jnp.linalg.norm(dx) + 1e-30))
        # 1e-2 gate on real hardware: the fused backward's W-tile moments and the Pallas
        # VPU exp differ from the XLA reference at bf16/transcendental rounding scale
        # (measured 4.4e-3 on v5e, 2026-08-20).  ALGORITHMIC parity is gated tight
        # (3e-4) by the CPU interpret suite (tests/test_pallas_interpret.py), and the
        # end-to-end hyper-gradient is separately gated vs dense Cholesky below
        # (mbcg_grad_dv_skip_identity).  The bit-exact contract here is the dv-skip
        # identity: same tile program minus the dv product.
        assert rel_dx < 1e-2, rel_dx
        assert rel_dv < 1e-2, rel_dv
        assert rel_skip < 1e-6, rel_skip
        out[f"kt{kt}"] = {"rel_dx": rel_dx, "rel_dv": rel_dv, "rel_dx_skip_vs_full": rel_skip}
    return out


@check("mbcg_grad_dv_skip_identity")
def _grad_identity():
    # end-to-end: MLL gradients with skip_matvec_cotangent wired in must match a dense
    # Cholesky MLL's gradients at small N (same operator, exact solve)
    import gpytorch_tpu as gp
    from gpytorch_tpu.distributions import MultivariateNormal
    from gpytorch_tpu.kernels import RBFKernel, ScaleKernel
    from gpytorch_tpu.likelihoods import GaussianLikelihood
    from gpytorch_tpu.means import ConstantMean
    from gpytorch_tpu.mlls import ExactMarginalLogLikelihood
    from gpytorch_tpu.models import ExactGP

    n, d = 1024, 3
    x, _ = _data(n, d)
    y = jnp.sin(4 * x[:, 0]) * jnp.cos(3 * x[:, 1]) + 0.05 * jax.random.normal(
        jax.random.PRNGKey(3), (n,), dtype=jnp.float32
    )

    class M(ExactGP):
        def __init__(self):
            super().__init__(x, y, GaussianLikelihood())
            self.mean_module = ConstantMean()
            self.covar_module = ScaleKernel(RBFKernel(ard_num_dims=d))

        def forward(self, xx):
            return MultivariateNormal(self.mean_module(xx), self.covar_module(xx))

    m = M()
    m.likelihood.noise = 0.05
    params = m.trainable_params()

    def loss_iter(p, key):
        mm = m.with_params(p)
        with gp.settings.max_cholesky_size(0), gp.settings.kernel_matvec_highest(True), \
                gp.settings.cg_tolerance(1e-6), gp.settings.max_cg_iterations(400), \
                gp.settings.num_trace_samples(64), \
                gp.settings.max_lanczos_quadrature_iterations(30):
            mll = ExactMarginalLogLikelihood(mm.likelihood, mm)
            return -mll(mm(x), y, key=key)

    def loss_chol(p):
        mm = m.with_params(p)
        with gp.settings.max_cholesky_size(10_000_000):
            mll = ExactMarginalLogLikelihood(mm.likelihood, mm)
            return -mll(mm(x), y)

    g_iter = jax.jit(jax.grad(loss_iter))(params, jax.random.PRNGKey(11))
    g_chol = jax.jit(jax.grad(loss_chol))(params)
    # PER-PARAMETER gates: a silently-zeroed small gradient (e.g. outputscale_bar if the
    # σ² cotangent route ever breaks again) hides inside a norm-level 5% gate
    out = {}
    for k in g_chol:
        gi, gc = jnp.ravel(g_iter[k]), jnp.ravel(g_chol[k])
        rel = float(jnp.linalg.norm(gi - gc) / (jnp.linalg.norm(gc) + 1e-30))
        out[k.split(".")[-1]] = rel
        assert rel < 0.15, (k, rel, [float(a) for a in gi[:3]], [float(a) for a in gc[:3]])
    return {"rel_grad_err_per_param": out}


@check("grad_only_twins_real_chip")
def _grad_only_twins():
    # grad-only twin primitives (settings.matvec_grad_only): zero primal, cotangents
    # identical to the real primitives' — on the real chip (the Pallas backward runs)
    import numpy as np

    import gpytorch_tpu as gp
    from gpytorch_tpu.ops import pallas_kernels as pk

    x, v = _data(2048, seed=7)
    g = jax.random.normal(jax.random.PRNGKey(9), v.shape, dtype=jnp.float32)
    os_ = jnp.float32(1.2)

    val = jax.jit(lambda: pk.fused_scaled_kernel_matvec_grad_only(x, x, v, os_, pk.RBF))()
    assert float(jnp.max(jnp.abs(val))) == 0.0

    def loss_real(x_, v_, s_):
        return jnp.sum(g * pk.fused_scaled_kernel_matvec(x_, x_, v_, s_, pk.RBF))

    def loss_go(x_, v_, s_):
        return jnp.sum(g * pk.fused_scaled_kernel_matvec_grad_only(x_, x_, v_, s_, pk.RBF))

    with gp.settings.skip_matvec_cotangent(True), gp.settings.kernel_matvec_high(True):
        want = jax.jit(jax.grad(loss_real, argnums=(0, 2)))(x, v, os_)
        got = jax.jit(jax.grad(loss_go, argnums=(0, 2)))(x, v, os_)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(float(got[1]), float(want[1]), rtol=1e-6)
    return {"dx_maxdiff": float(jnp.max(jnp.abs(got[0] - want[0])))}


@check("love_serving_smoke")
def _love():
    import gpytorch_tpu as gp
    from gpytorch_tpu.distributions import MultivariateNormal
    from gpytorch_tpu.kernels import RBFKernel, ScaleKernel
    from gpytorch_tpu.likelihoods import GaussianLikelihood
    from gpytorch_tpu.means import ConstantMean
    from gpytorch_tpu.models import ExactGP

    n, d, nt = 8192, 3, 512
    x, _ = _data(n, d)
    y = jnp.sin(4 * x[:, 0]) + 0.05 * jax.random.normal(jax.random.PRNGKey(5), (n,), dtype=jnp.float32)
    tx, _ = _data(nt, d, seed=42)

    class M(ExactGP):
        def __init__(self):
            super().__init__(x, y, GaussianLikelihood())
            self.mean_module = ConstantMean()
            self.covar_module = ScaleKernel(RBFKernel(ard_num_dims=d))

        def forward(self, xx):
            return MultivariateNormal(self.mean_module(xx), self.covar_module(xx))

    m = M().eval()
    m.likelihood.noise = 0.05
    with gp.settings.fast_pred_var(True), gp.settings.max_root_decomposition_size(50), \
            gp.settings.kernel_matvec_highest(True), gp.settings.eval_cg_tolerance(1e-3):
        t0 = time.perf_counter()
        var = m(tx).variance
        var.block_until_ready()
        cold_s = time.perf_counter() - t0
        var_fn = jax.jit(lambda: m(tx).variance)
        v2 = var_fn()
        v2.block_until_ready()
        t0 = time.perf_counter()
        var_fn().block_until_ready()
        cached_s = time.perf_counter() - t0
    # exact posterior variance is >= 0 and <= prior variance
    assert float(jnp.min(var)) > -1e-3
    assert bool(jnp.all(var < 2.0))
    return {"cold_s": round(cold_s, 3), "cached_s": round(cached_s, 4)}


@check("train_smoke_n8192")
def _train():
    import optax

    import gpytorch_tpu as gp
    from gpytorch_tpu.distributions import MultivariateNormal
    from gpytorch_tpu.kernels import RBFKernel, ScaleKernel
    from gpytorch_tpu.likelihoods import GaussianLikelihood
    from gpytorch_tpu.means import ConstantMean
    from gpytorch_tpu.mlls import ExactMarginalLogLikelihood
    from gpytorch_tpu.models import ExactGP
    from bench import _solver_ctx

    n, d = 8192, 3
    x, _ = _data(n, d)
    y = jnp.sin(4 * x[:, 0]) * jnp.cos(3 * x[:, 1]) + 0.1 * jax.random.normal(
        jax.random.PRNGKey(2), (n,), dtype=jnp.float32
    )
    y = (y - jnp.mean(y)) / jnp.std(y)

    class M(ExactGP):
        def __init__(self):
            super().__init__(x, y, GaussianLikelihood(noise_constraint=gp.constraints.GreaterThan(1e-4)))
            self.mean_module = ConstantMean()
            self.covar_module = ScaleKernel(RBFKernel(ard_num_dims=d))

        def forward(self, xx):
            return MultivariateNormal(self.mean_module(xx), self.covar_module(xx))

    m = M()
    m.likelihood.noise = 0.2
    m.covar_module.base_kernel.lengthscale = 0.5
    params = m.trainable_params()
    opt = optax.adam(0.1)

    def loss_fn(p, k, st):
        mm = m.with_params(p)
        mm.train_inputs = (x,)
        mm.train_targets = y
        with _solver_ctx(gp):
            mll = ExactMarginalLogLikelihood(mm.likelihood, mm)
            val, new_st = mll(mm(x), y, key=k, solver_state=st, return_state=True)
            return -val, new_st

    @jax.jit
    def step(p, s, k, st):
        (l, st2), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, k, st)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, l, st2

    s = opt.init(params)
    st = jnp.zeros((n, 1), jnp.float32)
    key = jax.random.PRNGKey(0)
    p = params
    losses = []
    for i in range(25):
        key, sub = jax.random.split(key)
        p, s, l, st = step(p, s, sub, st)
        losses.append(float(l))
    assert losses[-1] < losses[0] - 0.2, (losses[0], losses[-1])
    return {"loss_first": round(losses[0], 4), "loss_last": round(losses[-1], 4)}


def main():
    passed, failed = 0, 0
    details = {}
    for name, fn in RESULTS:
        t0 = time.perf_counter()
        try:
            info = fn()
            passed += 1
            details[name] = {"ok": True, "s": round(time.perf_counter() - t0, 1), **(info or {})}
        except Exception as e:
            failed += 1
            details[name] = {"ok": False, "error": f"{type(e).__name__}: {e}",
                             "trace": traceback.format_exc()[-500:]}
        print(json.dumps({name: details[name]}), flush=True)
    print(json.dumps({"tpu_tests": {"passed": passed, "failed": failed}}), flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
