"""Executable NumPyro API contract (VERDICT r3 ask #7).

NumPyro cannot be installed in this image (no package egress), so
``gpytorch_tpu/models/pyro.py`` has only ever executed against ``tests/_numpyro_shim.py``.
This module bounds the API-drift risk with an executable contract instead of prose:

* the always-running tests freeze the EXACT surface ``models/pyro.py`` consumes and assert
  the shim provides it with numpyro's documented call signatures (so the shim cannot drift
  from what the product code calls);
* the ``pytest.importorskip("numpyro")`` tests run the moment a real numpyro is present:
  they assert the real library exposes the same surface, that ``log_density`` agrees
  numerically with the shim on the same model, and that ``NumPyroGP.model/guide`` execute
  under real-numpyro handlers (the reference's integration shape:
  /root/reference/test/examples/test_pyro_integration.py).

Shim↔numpyro schema mapping (documented deltas, asserted below where checkable):
  - trace sites: numpyro uses OrderedDict entries with keys {"type", "name", "fn", "args",
    "kwargs", "value", "is_observed", ...}; the shim records {"type", "value", "log_prob",
    "is_observed"} — "log_prob" is pre-summed (numpyro recomputes via site["fn"].log_prob).
  - handlers.trace: numpyro's is a context/functor exposing ``get_trace``; the shim's wraps
    a callable and returns ``(result, trace)``.
  - infer.MCMC: the shim's kernel is fixed-step HMC (no NUTS tree adaptation, no support
    transforms — models must constrain latents inside the model, e.g. softplus).
"""

import inspect

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import _numpyro_shim as shim

# The exact numpyro names gpytorch_tpu/models/pyro.py calls (grep-audited 2026-08-19):
#   numpyro.sample / numpyro.factor / numpyro.plate
#   numpyro.handlers.{seed, scale}            (product code)
#   numpyro.handlers.{substitute, trace, condition, block}   (test/MCMC surface)
#   numpyro.distributions.{Normal, Distribution, constraints.real}
#   numpyro.infer.{NUTS, MCMC}; numpyro.infer.util.{log_density, potential_energy}
_CONSUMED_TOPLEVEL = ["sample", "factor", "plate"]
_CONSUMED_HANDLERS = ["seed", "substitute", "trace", "scale", "condition", "block"]
_CONSUMED_DIST = ["Normal", "Distribution"]
_CONSUMED_INFER = ["NUTS", "MCMC"]


def _accepts(fn, *kwargs):
    """True if ``fn`` accepts every name in ``kwargs`` as a keyword argument."""
    try:
        sig = inspect.signature(fn)
    except (TypeError, ValueError):  # C-implemented or wrapped; cannot check
        return True
    params = sig.parameters
    if any(p.kind is inspect.Parameter.VAR_KEYWORD for p in params.values()):
        return True
    return all(k in params for k in kwargs)


def _check_surface(mod, *, allow_infer_util=False):
    """Assert ``mod`` (shim or real numpyro) exposes the consumed surface."""
    for name in _CONSUMED_TOPLEVEL:
        assert hasattr(mod, name), f"missing numpyro.{name}"
    assert _accepts(mod.sample, "obs"), "numpyro.sample must accept obs="
    h = mod.handlers
    for name in _CONSUMED_HANDLERS:
        assert hasattr(h, name), f"missing numpyro.handlers.{name}"
    assert _accepts(h.seed, "rng_seed") or _accepts(h.seed, "rng_key")
    assert _accepts(h.substitute, "data")
    assert _accepts(h.scale, "scale")
    assert _accepts(h.condition, "data")
    assert _accepts(h.block, "hide")
    d = mod.distributions if hasattr(mod, "distributions") else None
    assert d is not None, "missing numpyro.distributions"
    for name in _CONSUMED_DIST:
        assert hasattr(d, name), f"missing numpyro.distributions.{name}"
    assert hasattr(d.constraints, "real")
    assert hasattr(mod.infer, "NUTS") and hasattr(mod.infer, "MCMC")
    assert _accepts(mod.infer.MCMC, "num_warmup", "num_samples")
    if allow_infer_util:
        from numpyro.infer.util import log_density, potential_energy  # noqa: F401
    else:
        assert callable(mod.log_density) and callable(mod.potential_energy)


def test_shim_provides_consumed_surface():
    """The shim must carry everything models/pyro.py (and the MCMC tests) call, with
    numpyro-compatible keyword signatures — the always-on half of the contract."""
    _check_surface(shim)
    # Distribution constructor contract used by _NumPyroPriorDist (models/pyro.py:107):
    # subclassable with batch_shape/event_shape kwargs and a class-level `support`.
    class _D(shim.distributions.Distribution):
        support = shim.distributions.constraints.real

        def __init__(self):
            super().__init__(batch_shape=(2,), event_shape=())

    assert _D().batch_shape == (2,)
    # Normal carries .to_event / .sample(key) / .log_prob — the exact calls in pyro_model
    n = shim.distributions.Normal(jnp.zeros(3), jnp.ones(3)).to_event(1)
    val = n.sample(jax.random.PRNGKey(0))
    assert val.shape == (3,)
    assert n.log_prob(val).shape == ()  # event dims summed


def test_shim_trace_schema_keys():
    """Freeze the shim's trace-site schema: the subset of numpyro's site dict the repo's
    tests read ({type, value, is_observed}) plus the shim-only pre-summed log_prob."""

    def model(y):
        mu = shim.sample("mu", shim.distributions.Normal(0.0, 1.0))
        shim.sample("y", shim.distributions.Normal(mu, 0.5), obs=y)
        shim.factor("extra", jnp.asarray(0.25))

    with shim.handlers.seed(rng_seed=0):
        _, tr = shim.handlers.trace(lambda: model(jnp.asarray([0.1])))()
    assert set(tr) == {"mu", "y", "extra"}
    for name in ("mu", "y"):
        assert {"type", "value", "log_prob", "is_observed"} <= set(tr[name])
        assert tr[name]["type"] == "sample"
    assert tr["mu"]["is_observed"] is False
    assert tr["y"]["is_observed"] is True
    assert tr["extra"]["type"] == "factor"


# ------------------------------------------------------------------------------------------
# Real-numpyro half: runs automatically when numpyro is installable.  Every test below is
# the executable form of a claim the README currently makes in prose.
# ------------------------------------------------------------------------------------------


def test_real_numpyro_surface_parity():
    numpyro = pytest.importorskip("numpyro")
    _check_surface(numpyro, allow_infer_util=True)


def test_real_numpyro_log_density_matches_shim():
    pytest.importorskip("numpyro")
    import numpyro
    import numpyro.distributions as ndist
    from numpyro.infer.util import log_density as real_log_density

    y = jnp.asarray([0.4, 0.6])

    def shim_model(y):
        mu = shim.sample("mu", shim.distributions.Normal(0.0, 1.0))
        shim.sample("y", shim.distributions.Normal(mu, 0.5), obs=y)

    def real_model(y):
        mu = numpyro.sample("mu", ndist.Normal(0.0, 1.0))
        numpyro.sample("y", ndist.Normal(mu, 0.5), obs=y)

    params = {"mu": jnp.asarray(0.5)}
    lj_shim, _ = shim.log_density(shim_model, (y,), {}, params)
    lj_real, _ = real_log_density(real_model, (y,), {}, params)
    np.testing.assert_allclose(float(lj_shim), float(lj_real), rtol=1e-5)


def test_real_numpyro_trace_schema_superset():
    """Real numpyro's trace sites must carry the keys the repo's shim-driven tests rely on
    (everything but the shim-only pre-summed log_prob)."""
    pytest.importorskip("numpyro")
    import numpyro
    import numpyro.distributions as ndist
    from numpyro import handlers as nh

    def model():
        mu = numpyro.sample("mu", ndist.Normal(0.0, 1.0))
        numpyro.sample("y", ndist.Normal(mu, 0.5), obs=jnp.asarray([0.1]))

    with nh.seed(rng_seed=0):
        tr = nh.trace(model).get_trace()
    for name in ("mu", "y"):
        assert {"type", "value", "is_observed"} <= set(tr[name])
    assert tr["y"]["is_observed"] is True


def test_real_numpyro_runs_numpyro_gp_svi():
    """NumPyroGP.model/guide under REAL numpyro SVI — the reference integration shape
    (/root/reference/test/examples/test_pyro_integration.py)."""
    pytest.importorskip("numpyro")
    import numpyro
    from numpyro.infer import SVI, Trace_ELBO

    import gpytorch_tpu.models.pyro as pyro_mod
    from gpytorch_tpu.distributions import MultivariateNormal
    from gpytorch_tpu.kernels import RBFKernel, ScaleKernel
    from gpytorch_tpu.likelihoods import GaussianLikelihood
    from gpytorch_tpu.means import ConstantMean
    from gpytorch_tpu.models.pyro import NumPyroGP
    from gpytorch_tpu.variational import CholeskyVariationalDistribution, VariationalStrategy

    assert pyro_mod._NUMPYRO_AVAILABLE

    class GP(NumPyroGP):
        def __init__(self):
            Z = jnp.linspace(0, 1, 8)[:, None]
            strategy = VariationalStrategy(
                self, Z, CholeskyVariationalDistribution(8),
                learn_inducing_locations=True, jitter_val=1e-4,
            )
            super().__init__(strategy, GaussianLikelihood(), num_data=32, name_prefix="gp")
            self.mean_module = ConstantMean()
            self.covar_module = ScaleKernel(RBFKernel())

        def forward(self, x):
            return MultivariateNormal(self.mean_module(x), self.covar_module(x))

    x = jnp.linspace(0, 1, 32)[:, None]
    y = jnp.sin(2 * jnp.pi * x[:, 0])
    gp = GP()
    _ = gp(x)
    svi = SVI(gp.model, gp.guide, numpyro.optim.Adam(0.01), Trace_ELBO())
    state = svi.init(jax.random.PRNGKey(0), x, y)
    state, loss = svi.update(state, x, y)
    assert bool(jnp.isfinite(loss)), float(loss)
