"""PPL (NumPyro) integration — the JAX analogue of the reference's Pyro hooks.

Reference: gpytorch/models/pyro/pyro_gp.py:11 (``PyroGP.model/guide``),
gpytorch/models/pyro/_pyro_mixin.py:9, and the module-level hooks
``pyro_sample_from_prior`` / ``pyro_load_from_samples`` (gpytorch/module.py:415-475).

NumPyro is an optional dependency (import-guarded, like the reference's pyro).  The two
module-level hooks have pure-JAX equivalents that work without it:

  * :func:`sample_from_prior_tree` — draw one sample of every registered prior and write
    it back through its setting closure (explicit PRNG key instead of pyro sample sites);
  * :func:`load_from_samples_tree` — batch-load MCMC/SVI posterior samples (a dict keyed
    by *prior names*) into a module, giving a batch model over the sample dimension.

With numpyro installed, :class:`NumPyroGP` exposes ``model``/``guide`` callables for
``numpyro.infer.SVI``, and :func:`numpyro_sample_from_prior` registers a ``numpyro.sample``
site per registered prior.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..core.module import Module
from .approximate_gp import ApproximateGP

try:  # pragma: no cover - optional dependency (not in the TPU image)
    import numpyro as _numpyro
    import numpyro.distributions as _numpyro_dist

    _NUMPYRO_AVAILABLE = True
except ImportError:
    _numpyro = None
    _numpyro_dist = None
    _NUMPYRO_AVAILABLE = False


def _require_numpyro():
    if not _NUMPYRO_AVAILABLE:
        raise ImportError(
            "NumPyro is not installed. The pure-JAX hooks (sample_from_prior_tree, "
            "load_from_samples_tree) work without it; NumPyroGP / numpyro_sample_from_prior "
            "require `pip install numpyro`."
        )


# -- pure-JAX module hooks (reference module.py:415-475 equivalents) -------------------------

def sample_from_prior_tree(module: Module, key: jax.Array) -> Module:
    """Return a copy of ``module`` with every registered prior sampled and written back
    through its setting closure (reference pyro_sample_from_prior, module.py:433-442,
    with an explicit PRNG key instead of global sample sites)."""
    new = module.deepcopy()
    for i, (name, mod, prior, closure, setting_closure) in enumerate(list(new.named_priors())):
        if setting_closure is None:
            raise RuntimeError(f"Prior {name!r} has no setting_closure; cannot sample into the module")
        sub = jax.random.fold_in(key, i)
        value = prior.sample(sub)
        setting_closure(mod, value)
    return new


def load_from_samples_tree(module: Module, samples_dict: Dict[str, jax.Array]) -> Module:
    """Batch-load posterior samples into a copy of ``module`` (reference
    pyro_load_from_samples, module.py:464-475).  Keys are *prior names*
    (e.g. ``covar_module.lengthscale_prior``); values carry a leading sample dimension,
    turning the result into a batch model over samples."""
    new = module.deepcopy()
    found = set()
    for name, mod, prior, closure, setting_closure in list(new.named_priors()):
        if name in samples_dict:
            if setting_closure is None:
                raise RuntimeError(f"Must provide setting_closure to load samples for {name!r}")
            setting_closure(mod, jnp.asarray(samples_dict[name]))
            found.add(name)
    missing = set(samples_dict) - found
    if missing:
        raise RuntimeError(f"samples_dict entries with no matching prior: {sorted(missing)}")
    return new


def numpyro_sample_from_prior(module: Module, prefix: str = "") -> Module:
    """Register a ``numpyro.sample`` site for every registered prior and return a module
    copy with the sampled values loaded (for use inside a numpyro model)."""
    _require_numpyro()
    new = module.deepcopy()
    for name, mod, prior, closure, setting_closure in list(new.named_priors()):
        if setting_closure is None:
            raise RuntimeError(f"Prior {name!r} has no setting_closure; cannot sample into the module")
        site = f"{prefix}.{name}" if prefix else name
        value = _numpyro.sample(site, _NumPyroPriorDist(prior, closure(mod)))
        setting_closure(mod, value)
    return new


class _NumPyroPriorDist:  # pragma: no cover - needs numpyro
    """Minimal numpyro-Distribution adapter over a gpytorch_tpu Prior."""

    def __new__(cls, prior, example):
        _require_numpyro()

        shape = jnp.shape(example)

        class _Adapter(_numpyro_dist.Distribution):
            support = _numpyro_dist.constraints.real

            def __init__(self):
                super().__init__(batch_shape=(), event_shape=shape)

            def sample(self, key, sample_shape=()):
                return prior.sample(key, sample_shape)

            def log_prob(self, value):
                return jnp.sum(prior.log_prob(value))

        return _Adapter()


class _PyroMixin:
    """NumPyro analogue of the reference ``_PyroMixin``
    (gpytorch/models/pyro/_pyro_mixin.py:9): ``pyro_guide``/``pyro_model`` register the
    inducing-value sample site plus prior/added-loss factors, and return the function
    distribution over ``input``.  Mixed into ``ApproximateGP`` subclasses that want to be
    driven by a NumPyro model instead of an ELBO objective."""

    def pyro_guide(self, input, beta: float = 1.0, name_prefix: str = ""):
        _require_numpyro()
        # Inducing values q(u), beta-scaled
        with _numpyro.handlers.scale(scale=beta):
            vdist = self.variational_strategy.variational_distribution
            _numpyro.sample(
                name_prefix + ".u",
                _numpyro_dist.Normal(vdist.mean, jnp.sqrt(vdist.variance)).to_event(1),
            )
        # q(f) over the inputs
        function_dist = self(input, prior=False)
        return _numpyro_dist.Normal(function_dist.mean, jnp.sqrt(function_dist.variance)).to_event(1)

    def pyro_model(self, input, beta: float = 1.0, name_prefix: str = ""):
        _require_numpyro()
        # Inducing values p(u), beta-scaled
        with _numpyro.handlers.scale(scale=beta):
            pdist = self.variational_strategy.prior_distribution(model=self)
            u_samples = _numpyro.sample(
                name_prefix + ".u",
                _numpyro_dist.Normal(pdist.mean, jnp.sqrt(pdist.variance)).to_event(1),
            )
        # registered-prior log-prob factor (reference _pyro_mixin.py:31-36)
        log_prior = jnp.zeros((), dtype=u_samples.dtype)
        for _, module, prior, closure, _ in self.named_priors():
            log_prior = log_prior + jnp.sum(prior.log_prob(closure(module)))
        _numpyro.factor(name_prefix + ".log_prior", log_prior)
        # added-loss-term factor (reference _pyro_mixin.py:38-42)
        added_loss = jnp.zeros((), dtype=u_samples.dtype)
        for added_loss_term in self.added_loss_terms():
            added_loss = added_loss + jnp.sum(added_loss_term.loss())
        _numpyro.factor(name_prefix + ".added_loss", added_loss)
        # p(f) over the inputs
        function_dist = self(input, prior=True)
        return _numpyro_dist.Normal(function_dist.mean, jnp.sqrt(function_dist.variance)).to_event(1)


class NumPyroGP(ApproximateGP):
    """Variational GP pluggable into NumPyro SVI (reference PyroGP,
    models/pyro/pyro_gp.py:11).

    ``model(x, y)`` registers the likelihood factor scaled by beta and a latent-function
    sample site; ``guide(x, y)`` registers the variational approximation.  Requires
    numpyro (import-guarded like the reference's pyro dependency).
    """

    def __init__(self, variational_strategy, likelihood, num_data: int, name_prefix: str = "",
                 beta: float = 1.0):
        super().__init__(variational_strategy)
        self.likelihood = likelihood
        self.num_data = int(num_data)
        self.name_prefix = str(name_prefix)
        self.beta = float(beta)

    def _f_dist(self, x, prior: bool = False):
        out = self(x, prior=prior)
        return out

    def guide(self, x, y=None):
        """q(f(x)) sample site (reference pyro_gp.py guide)."""
        _require_numpyro()
        f_dist = self._f_dist(x)
        _numpyro.sample(
            f"{self.name_prefix}.f(x)",
            _numpyro_dist.Normal(f_dist.mean, jnp.sqrt(f_dist.variance)).to_event(1),
        )

    def model(self, x, y=None):
        """p(y | f(x)) with the prior f ~ p(f(x)) and the beta-scaled KL handled by the
        variational strategy (reference pyro_gp.py model)."""
        _require_numpyro()
        prior_dist = self._f_dist(x, prior=True)
        f = _numpyro.sample(
            f"{self.name_prefix}.f(x)",
            _numpyro_dist.Normal(prior_dist.mean, jnp.sqrt(prior_dist.variance)).to_event(1),
        )
        kl = self.variational_strategy.kl_divergence(model=self) * (self.beta / self.num_data)
        _numpyro.factor(f"{self.name_prefix}.kl", -jnp.sum(kl))
        if y is not None:
            obs_dist = self.likelihood(f)
            with _numpyro.plate(f"{self.name_prefix}.data", y.shape[-1]):
                _numpyro.sample(f"{self.name_prefix}.y", obs_dist, obs=y)
        return f


# reference-name alias
PyroGP = NumPyroGP


# -- reference import paths (gpytorch/models/pyro/) ---------------------------------------
from .._submodule_alias import install_submodule_aliases as _install

_install(__name__, {
    "pyro_gp": {"PyroGP": PyroGP, "NumPyroGP": NumPyroGP},
    "_pyro_mixin": {"_PyroMixin": _PyroMixin},
})
