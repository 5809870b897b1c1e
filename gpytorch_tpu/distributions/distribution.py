"""Distribution base — a pytree so distributions can cross jit boundaries."""

from __future__ import annotations

from ..core.pytree import DictPyTree, register_dynamic_base


class Distribution(DictPyTree):
    @property
    def batch_shape(self):
        raise NotImplementedError

    @property
    def event_shape(self):
        raise NotImplementedError

    def log_prob(self, value):
        raise NotImplementedError

    def rsample(self, key, sample_shape=()):
        raise NotImplementedError

    def sample(self, key, sample_shape=()):
        import jax

        return jax.lax.stop_gradient(self.rsample(key, sample_shape))


register_dynamic_base(Distribution)
