"""Chipless TPU AOT compile checks (jax.experimental.topologies + local libtpu).

Compiles the flagship N=100k training step — fused Pallas kernels, mBCG while-loops,
preconditioner build, BBMM custom-VJP backward — against a v5e:1x1x1 topology WITHOUT any
TPU attached.  Catches Mosaic lowering errors, VMEM overflows and HBM blow-ups (e.g. an
accidental densification of the N×N kernel) that CPU tests structurally cannot see.

Runs in a subprocess: libtpu reads TPU_ACCELERATOR_TYPE/TPU_WORKER_HOSTNAMES at first
init, and the parent test process has already initialized jax on CPU.
"""

import os
import subprocess
import sys

import pytest

_CHILD = r"""
import contextlib
import jax, jax.numpy as jnp
from jax.experimental import topologies
from jax.sharding import SingleDeviceSharding

topo = topologies.get_topology_desc(platform="tpu", topology_name="v5e:1x1x1",
                                    chips_per_host_bounds=[1, 1, 1])
sh = SingleDeviceSharding(topo.devices[0])

import gpytorch_tpu as gp
from gpytorch_tpu.distributions import MultivariateNormal
from gpytorch_tpu.kernels import RBFKernel, ScaleKernel
from gpytorch_tpu.likelihoods import GaussianLikelihood
from gpytorch_tpu.means import ConstantMean
from gpytorch_tpu.models import ExactGP
from gpytorch_tpu.mlls import ExactMarginalLogLikelihood

N, D, PROBES = 100000, 3, 31

class M(ExactGP):
    def __init__(s, a, b, l):
        super().__init__(a, b, l)
        s.mean_module = ConstantMean()
        s.covar_module = ScaleKernel(RBFKernel(ard_num_dims=D))

    def forward(s, xx):
        return MultivariateNormal(s.mean_module(xx), s.covar_module(xx))

model = M(jnp.zeros((N, D), jnp.float32), jnp.zeros((N,), jnp.float32),
          GaussianLikelihood(noise_constraint=gp.constraints.GreaterThan(1.5e-2)))
params = model.trainable_params()

def ctx(warm):
    st = contextlib.ExitStack()
    st.enter_context(gp.settings.max_cholesky_size(0))
    st.enter_context(gp.settings.max_cg_iterations(100))
    st.enter_context(gp.settings.cg_tolerance(1.0))
    st.enter_context(gp.settings.num_trace_samples(PROBES))
    st.enter_context(gp.settings.max_lanczos_quadrature_iterations(5))
    st.enter_context(gp.settings.max_preconditioner_size(50))
    st.enter_context(gp.settings.cg_stall_window(5))
    st.enter_context(gp.settings.preconditioner_noise_budget(1e-3))
    st.enter_context(gp.settings.use_pallas(True))
    st.enter_context(gp.settings.kernel_matvec_high(True))
    if warm:
        st.enter_context(gp.settings.skip_logdet_forward(True))
    return st

def make_step(warm):
    def loss(p, xx, yy, k, st_):
        m = model.with_params(p)
        m.train_inputs = (xx,)
        m.train_targets = yy
        with ctx(warm):
            mll = ExactMarginalLogLikelihood(m.likelihood, m)
            if warm:
                val, new_st = mll(m(xx), yy, key=k, solver_state=st_, return_state=True)
                return -val, new_st
            return -mll(m(xx), yy, key=k), st_
    return lambda p, xx, yy, k, st_: jax.value_and_grad(loss, has_aux=True)(p, xx, yy, k, st_)

xs = jax.ShapeDtypeStruct((N, D), jnp.float32, sharding=sh)
ys = jax.ShapeDtypeStruct((N,), jnp.float32, sharding=sh)
ks = jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=sh)
sts = jax.ShapeDtypeStruct((N, 1 + PROBES), jnp.float32, sharding=sh)
ps = jax.tree_util.tree_map(
    lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a), sharding=sh), params)

HBM = 16 * 1024**3
for warm in (False, True):
    c = jax.jit(make_step(warm)).lower(ps, xs, ys, ks, sts).compile()
    ma = c.memory_analysis()
    total = ma.temp_size_in_bytes + ma.argument_size_in_bytes + ma.output_size_in_bytes
    assert total < 0.5 * HBM, (warm, total)
    print(f"AOT OK warm={warm} temp={ma.temp_size_in_bytes/1e9:.2f}GB")
print("AOT-ALL-OK")
"""


def _has_libtpu() -> bool:
    try:
        import libtpu  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _has_libtpu(), reason="local libtpu not found")
@pytest.mark.skipif(
    os.environ.get("GPYTORCH_TPU_AOT_TEST", "0") != "1",
    reason="~8-10 min of chipless XLA:TPU compilation; opt in with GPYTORCH_TPU_AOT_TEST=1",
)
def test_flagship_train_step_compiles_for_v5e():
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        TPU_ACCELERATOR_TYPE="v5litepod-1",
        TPU_WORKER_HOSTNAMES="localhost",
        GPYTORCH_TPU_FORCE_PALLAS="1",
        # repo only — axon's sitecustomize (if on PYTHONPATH) registers the tunnel
        # backend and overrides JAX_PLATFORMS=cpu, breaking chipless AOT
        PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    env.pop("PALLAS_AXON_POOL_IPS", None)
    res = subprocess.run(
        [sys.executable, "-c", _CHILD], env=env, capture_output=True, text=True, timeout=1800
    )
    if "libtpu" in (res.stderr or "") and "No such file" in (res.stderr or ""):
        pytest.skip("libtpu unavailable")
    assert res.returncode == 0, (res.stdout[-2000:], res.stderr[-2000:])
    assert "AOT-ALL-OK" in res.stdout


_CHILD_SHARDED = r"""
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import topologies
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

topo = topologies.get_topology_desc(platform="tpu", topology_name="v5e:2x4",
                                    chips_per_host_bounds=[2, 4, 1])
mesh = Mesh(np.array(topo.devices), ("data",))

import gpytorch_tpu as gp
from gpytorch_tpu.distributed import ShardedKernel, make_sharded_mll
from gpytorch_tpu.distributions import MultivariateNormal
from gpytorch_tpu.kernels import RBFKernel, ScaleKernel
from gpytorch_tpu.likelihoods import GaussianLikelihood
from gpytorch_tpu.means import ConstantMean
from gpytorch_tpu.models import ExactGP

N_DEV, D = 8, 3
N = 100_000 // N_DEV * N_DEV

class Model(ExactGP):
    def __init__(self, tx, ty, lik):
        super().__init__(tx, ty, lik)
        self.mean_module = ConstantMean()
        self.covar_module = ShardedKernel(ScaleKernel(RBFKernel(ard_num_dims=D)), num_devices=N_DEV)

    def forward(self, xx):
        return MultivariateNormal(self.mean_module(xx), self.covar_module(xx))

model = Model(jnp.zeros((N, D), jnp.float32), jnp.zeros((N,), jnp.float32), GaussianLikelihood())
params = model.trainable_params()

def step(p, x, y, key):
    with gp.settings.max_cholesky_size(0), gp.settings.num_trace_samples(16), \
         gp.settings.max_cg_iterations(100), gp.settings.cg_stall_window(5), \
         gp.settings.max_preconditioner_size(50), gp.settings.preconditioner_noise_budget(1e-3), \
         gp.settings.max_lanczos_quadrature_iterations(5), gp.settings.use_pallas(True), \
         gp.settings.kernel_matvec_high(True):
        mll_fn = make_sharded_mll(mesh, model)
        return jax.value_and_grad(lambda pp: -mll_fn(pp, x, y, key=key))(p)

xsh = NamedSharding(mesh, P("data", None))
ysh = NamedSharding(mesh, P("data"))
rep = NamedSharding(mesh, P())
xs = jax.ShapeDtypeStruct((N, D), jnp.float32, sharding=xsh)
ys = jax.ShapeDtypeStruct((N,), jnp.float32, sharding=ysh)
ks = jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=rep)
ps = jax.tree_util.tree_map(lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a), sharding=rep), params)

c = jax.jit(step).lower(ps, xs, ys, ks).compile()
ma = c.memory_analysis()
HBM = 16 * 1024**3
assert ma.temp_size_in_bytes < 0.25 * HBM
print(f"SHARDED AOT OK temp={ma.temp_size_in_bytes/1e9:.3f}GB")
print("AOT-ALL-OK")
"""


@pytest.mark.skipif(not _has_libtpu(), reason="local libtpu not found")
@pytest.mark.skipif(
    os.environ.get("GPYTORCH_TPU_AOT_TEST", "0") != "1",
    reason="minutes of chipless XLA:TPU compilation; opt in with GPYTORCH_TPU_AOT_TEST=1",
)
def test_sharded_train_step_compiles_for_v5e_8():
    """The BASELINE north-star config: row-sharded exact-GP mBCG at N=100k on a REAL
    v5e-8 topology (2x4 mesh) — collectives, Pallas kernels, BBMM backward compile
    per-device with bounded HBM, without any TPU attached."""
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        TPU_ACCELERATOR_TYPE="v5litepod-8",
        TPU_WORKER_HOSTNAMES="localhost",
        GPYTORCH_TPU_FORCE_PALLAS="1",
        PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    env.pop("PALLAS_AXON_POOL_IPS", None)
    res = subprocess.run(
        [sys.executable, "-c", _CHILD_SHARDED], env=env, capture_output=True, text=True, timeout=1800
    )
    assert res.returncode == 0, (res.stdout[-2000:], res.stderr[-2000:])
    assert "AOT-ALL-OK" in res.stdout


_CHILD_KERNEL_MATRIX = r"""
import contextlib
import jax, jax.numpy as jnp
from jax.experimental import topologies
from jax.sharding import SingleDeviceSharding

topo = topologies.get_topology_desc(platform="tpu", topology_name="v5e:1x1x1",
                                    chips_per_host_bounds=[1, 1, 1])
sh = SingleDeviceSharding(topo.devices[0])

import gpytorch_tpu as gp
from gpytorch_tpu.ops import pallas_kernels as pk

N = 4096
x = jax.ShapeDtypeStruct((N, 3), jnp.float32, sharding=sh)
modes = [("default", None), ("bf16", gp.settings.kernel_matvec_bf16),
         ("high", gp.settings.kernel_matvec_high),
         ("highest", gp.settings.kernel_matvec_highest),
         ("cbf16", gp.settings.kernel_matvec_consistent_bf16)]
for t in (32, 128):
    g = jax.ShapeDtypeStruct((N, t), jnp.float32, sharding=sh)
    v = jax.ShapeDtypeStruct((N, t), jnp.float32, sharding=sh)
    for mode, ctx in modes:
        cm = ctx(True) if ctx is not None else contextlib.nullcontext()
        with cm:
            for kt in (pk.RBF, pk.MATERN05, pk.MATERN15, pk.MATERN25):
                jax.jit(lambda x, g, v, kt=kt: pk._matvec_pallas(x, x, v, kt)).lower(x, x, v).compile()
                jax.jit(lambda x, g, v, kt=kt: pk._bwd_fused_pallas(x, g, v, kt)).lower(x, g, v).compile()
                print(f"OK {mode} kt{kt} t{t}")
print("AOT-ALL-OK")
"""


@pytest.mark.skipif(not _has_libtpu(), reason="local libtpu not found")
@pytest.mark.skipif(
    os.environ.get("GPYTORCH_TPU_AOT_TEST", "0") != "1",
    reason="minutes of chipless XLA:TPU compilation; opt in with GPYTORCH_TPU_AOT_TEST=1",
)
def test_kernel_mode_matrix_compiles_for_v5e():
    """Every (precision mode × kernel family × column width) Mosaic-compiles within the
    scoped-VMEM stack limit, forward AND fused backward.  Regression for the 2026-08-19
    finding: the n_sub=2 backward OOM'd scoped VMEM (22.4 MB vs 16 MB) for all Matérn
    backwards at DEFAULT precision and all bf16 backwards — configurations the flagship
    bench (RBF, high) never exercises and interpret-mode CPU tests cannot see."""
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        TPU_ACCELERATOR_TYPE="v5litepod-1",
        TPU_WORKER_HOSTNAMES="localhost",
        GPYTORCH_TPU_FORCE_PALLAS="1",
        PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    env.pop("PALLAS_AXON_POOL_IPS", None)
    res = subprocess.run(
        [sys.executable, "-c", _CHILD_KERNEL_MATRIX], env=env, capture_output=True, text=True,
        timeout=1800,
    )
    assert res.returncode == 0, (res.stdout[-2000:], res.stderr[-2000:])
    assert "AOT-ALL-OK" in res.stdout
