"""SpectralDeltaKernel (reference: gpytorch/kernels/spectral_delta_kernel.py:12):
point-mass spectral density → k(x,x') = (1/Q) Σ_q cos(2π (x−x')ᵀ z_q); low-rank via the
cos/sin feature map."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constraints import Positive
from ..linop import MatmulLinearOperator, RootLinearOperator
from .kernel import Kernel


class SpectralDeltaKernel(Kernel):
    has_lengthscale = True
    returns_lazy_structure = True

    def __init__(self, num_dims: int, num_deltas: int = 128, Z_constraint=None, **kwargs):
        super().__init__(ard_num_dims=num_dims, **kwargs)
        self.num_deltas = int(num_deltas)
        self.register_parameter(
            "raw_Z",
            jax.random.normal(jax.random.PRNGKey(0), self.batch_shape + (num_deltas, num_dims), dtype=self._param_dtype)
            * 0.01,
        )
        self.register_constraint("raw_Z", Z_constraint or Positive())

    @property
    def Z(self):
        return self._constrained("raw_Z")

    @Z.setter
    def Z(self, value):
        self._set_constrained("raw_Z", value)

    def initialize_from_data(self, train_x, train_y, key=None):
        """Init deltas from input spacing statistics (reference initialize_from_data)."""
        import numpy as np

        train_x = np.asarray(train_x)
        if train_x.ndim == 1:
            train_x = train_x[:, None]
        train_x_sort = np.sort(train_x, axis=-2)
        max_dist = train_x_sort[-1, :] - train_x_sort[0, :] + 1e-12
        rng = np.random.RandomState(0)
        Z = rng.rand(self.num_deltas, train_x.shape[-1]) / max_dist
        self.Z = jnp.asarray(np.broadcast_to(Z, np.shape(self.raw_Z)))
        return self

    def _featurize(self, x):
        proj = 2.0 * jnp.pi * ((x / self.lengthscale) @ jnp.swapaxes(self.Z, -1, -2))  # (..., n, Q)
        return jnp.concatenate([jnp.cos(proj), jnp.sin(proj)], axis=-1)

    def forward(self, x1, x2, diag=False, last_dim_is_batch=False, **params):
        if last_dim_is_batch:
            x1 = jnp.swapaxes(x1, -1, -2)[..., None]
            x2 = jnp.swapaxes(x2, -1, -2)[..., None]
        z1 = self._featurize(x1)
        z2 = z1 if x1 is x2 else self._featurize(x2)
        Q = float(self.num_deltas)
        if diag:
            return jnp.sum(z1 * z2, axis=-1) / Q
        if x1 is x2:
            return RootLinearOperator(z1 / jnp.sqrt(Q))
        return MatmulLinearOperator(z1 / Q, jnp.swapaxes(z2, -1, -2))
