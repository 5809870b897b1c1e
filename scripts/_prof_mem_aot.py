"""Chipless peak-memory ablation: fused Pallas vs plain-XLA chunked training step
(VERDICT r4 ask #9 — the fusion's primary claim is memory).

Compiles the EXACT flagship value_and_grad step for a v5e:1x1x1 topology with local
libtpu (no chip needed) and reads XLA's own memory accounting.  Result (2026-08-20,
N=100k, 63 probes, NTRI=7, rank-50 preconditioner, VR backward):

  * fused Pallas:   temp = 0.39 GiB  (streaming O(N·t) — never materializes K)
  * chunked XLA:    RESOURCE_EXHAUSTED at compile — the autodiff residuals of the
    chunked matmul materialize the full f32[100000, 100000] kernel (37.3 GiB against
    the 16 GiB HBM).  The same failure reproduces on the real chip
    (scripts/_prof_mem.py, queue R5H: `Allocation (size=40038400000) would exceed
    memory`).

So at the flagship N the plain-XLA baseline does not merely lose the 1.64× speed
ablation (BENCH vs_baseline, measured at N=20k where it fits) — it cannot run at all.

Usage: JAX_PLATFORMS=cpu TPU_ACCELERATOR_TYPE=v5litepod-1 TPU_WORKER_HOSTNAMES=localhost \
       GPYTORCH_TPU_FORCE_PALLAS=1 python scripts/_prof_mem_aot.py [N]
Prints one JSON line per mode.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import contextlib
import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.experimental import topologies
from jax.sharding import SingleDeviceSharding

import gpytorch_tpu as gp
from gpytorch_tpu.distributions import MultivariateNormal
from gpytorch_tpu.kernels import RBFKernel, ScaleKernel
from gpytorch_tpu.likelihoods import GaussianLikelihood
from gpytorch_tpu.means import ConstantMean
from gpytorch_tpu.mlls import ExactMarginalLogLikelihood
from gpytorch_tpu.models import ExactGP


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    D, PROBES = 3, 63
    topo = topologies.get_topology_desc(
        platform="tpu", topology_name="v5e:1x1x1", chips_per_host_bounds=[1, 1, 1]
    )
    sh = SingleDeviceSharding(topo.devices[0])

    class M(ExactGP):
        def __init__(self):
            super().__init__(None, None, GaussianLikelihood())
            self.mean_module = ConstantMean()
            self.covar_module = ScaleKernel(RBFKernel(ard_num_dims=D))

        def forward(self, xx):
            return MultivariateNormal(self.mean_module(xx), self.covar_module(xx))

    model = M()
    params = model.trainable_params()

    def ctx(pallas):
        st = contextlib.ExitStack()
        for c in [
            gp.settings.max_cholesky_size(0), gp.settings.max_cg_iterations(100),
            gp.settings.cg_tolerance(1.0), gp.settings.num_trace_samples(PROBES),
            gp.settings.max_lanczos_quadrature_iterations(7),
            gp.settings.max_preconditioner_size(50),
            gp.settings.preconditioner_noise_budget(1e-3),
            gp.settings.precond_logdet_vr(True), gp.settings.fast_precond_grad(True),
            gp.settings.use_pallas(pallas),
        ]:
            st.enter_context(c)
        if pallas:
            st.enter_context(gp.settings.kernel_matvec_high(True))
        return st

    def make_step(pallas):
        def loss(p, xx, yy, k):
            m = model.with_params(p)
            m.train_inputs = (xx,)
            m.train_targets = yy
            with ctx(pallas):
                return -ExactMarginalLogLikelihood(m.likelihood, m)(m(xx), yy, key=k)

        return lambda p, xx, yy, k: jax.value_and_grad(loss)(p, xx, yy, k)

    xs = jax.ShapeDtypeStruct((N, D), jnp.float32, sharding=sh)
    ys = jax.ShapeDtypeStruct((N,), jnp.float32, sharding=sh)
    ks = jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=sh)
    ps = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a), sharding=sh), params
    )

    for name, pallas in (("fused", True), ("chunked_xla", False)):
        try:
            c = jax.jit(make_step(pallas)).lower(ps, xs, ys, ks).compile()
            ma = c.memory_analysis()
            print(json.dumps({
                "mode": name, "n": N,
                "temp_gib": round(ma.temp_size_in_bytes / 2**30, 3),
                "args_gib": round(ma.argument_size_in_bytes / 2**30, 4),
            }), flush=True)
        except Exception as e:
            print(json.dumps({
                "mode": name, "n": N, "error": str(e)[:200]
            }), flush=True)


if __name__ == "__main__":
    main()
