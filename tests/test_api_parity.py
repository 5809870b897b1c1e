"""Namespace/API-surface parity with the reference public names (reference:
gpytorch/kernels/keops/__init__.py, distributions/__init__.py:11-19, utils/__init__.py,
models/__init__.py:15-41, variational natural bases, multitask likelihood base)."""

import jax
import pytest

import gpytorch_tpu as gp


def test_keops_namespace_aliases_fused_kernels():
    from gpytorch_tpu.kernels import keops

    assert keops.RBFKernel is gp.kernels.RBFKernel
    assert keops.MaternKernel is gp.kernels.MaternKernel
    assert keops.PeriodicKernel is gp.kernels.PeriodicKernel
    assert keops.KeOpsKernel is gp.kernels.Kernel


def test_base_distributions_namespace():
    from gpytorch_tpu.distributions import base_distributions

    d = base_distributions.Normal(0.0, 1.0)
    assert float(d.log_prob(jax.numpy.asarray(0.0))) == pytest.approx(-0.9189385, rel=1e-5)


def test_deprecated_model_aliases():
    from gpytorch_tpu.models import AbstractVariationalGP, ApproximateGP, VariationalGP

    assert VariationalGP is ApproximateGP
    assert issubclass(AbstractVariationalGP, ApproximateGP)


def test_natural_distribution_marker_base():
    from gpytorch_tpu.variational import (
        NaturalVariationalDistribution,
        TrilNaturalVariationalDistribution,
        _NaturalVariationalDistribution,
    )

    assert issubclass(NaturalVariationalDistribution, _NaturalVariationalDistribution)
    assert issubclass(TrilNaturalVariationalDistribution, _NaturalVariationalDistribution)
    dist = NaturalVariationalDistribution(8)
    assert isinstance(dist, _NaturalVariationalDistribution)


def test_multitask_likelihood_marker_base():
    from gpytorch_tpu.likelihoods import MultitaskGaussianLikelihood, _MultitaskGaussianLikelihoodBase

    lik = MultitaskGaussianLikelihood(num_tasks=2)
    assert isinstance(lik, _MultitaskGaussianLikelihoodBase)


def test_cached_memoize_decorator():
    from gpytorch_tpu.utils import cached, clear_cache_hook, pop_from_cache

    calls = []

    class T:
        @cached(name="val")
        def f(self, x):
            calls.append(x)
            return x * 2

        @cached(ignore_args=True, name="once")
        def g(self, x):
            calls.append("g")
            return x

    t = T()
    assert t.f(3) == 6 and t.f(3) == 6
    assert calls == [3]  # second call memoized
    assert t.f(4) == 8 and calls == [3, 4]  # distinct args → distinct cache entries
    assert t.g(1) == 1 and t.g(99) == 1  # ignore_args: first result sticks
    pop_from_cache(t, "val")
    assert t.f(3) == 6 and calls[-1] == 3  # recomputed after pop
    clear_cache_hook(t)
    assert not t._cache


def test_utils_submodule_namespace():
    from gpytorch_tpu.utils import deprecation, generic, interpolation, quadrature  # noqa: F401

    assert hasattr(deprecation, "DeprecationError")
    assert hasattr(quadrature, "GaussHermiteQuadrature1D")
