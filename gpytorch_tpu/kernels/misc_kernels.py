"""Long-tail kernels: Arc, Cylindrical, Gibbs, HammingIMQ, SphericalLinear,
DistributionalInput, GaussianSymmetrizedKL.

References: gpytorch/kernels/arc_kernel.py:14, cylindrical_kernel.py:14, gibbs_kernel.py:13,
hamming_kernel.py:14, spherical_linear_kernel.py:28, distributional_input_kernel.py:12,
gaussian_symmetrized_kl_kernel.py:42.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..constraints import Interval, Positive
from .kernel import Kernel



def _ones_delta(x):
    """Default unit delta/lengthscale function (module-level so kernels stay picklable)."""
    return jnp.ones_like(x[..., 0])


class ArcKernel(Kernel):
    """Embeds inputs on a hypersphere arc then applies the base kernel
    (reference: arc_kernel.py:14; arXiv 1806.08195)."""

    has_lengthscale = True

    def __init__(self, base_kernel, delta_func: Optional[Callable] = None, angle_prior=None, radius_prior=None, **kwargs):
        super().__init__(**kwargs)
        if base_kernel.has_lengthscale:
            base_kernel.lengthscale = 1.0
        self.base_kernel = base_kernel
        if delta_func is None:
            delta_func = _ones_delta  # module-level default: keeps the kernel picklable
        self.delta_func = delta_func
        num_dims = self.ard_num_dims if self.ard_num_dims is not None else 1
        dt = self._param_dtype
        self.register_parameter("raw_angle", jnp.zeros(self.batch_shape + (1, num_dims), dtype=dt))
        self.register_constraint("raw_angle", Interval(0.0, 1.0))
        self.register_parameter("raw_radius", jnp.zeros(self.batch_shape + (1, num_dims), dtype=dt))
        self.register_constraint("raw_radius", Positive())
        if angle_prior is not None:
            self.register_prior("angle_prior", angle_prior, lambda m: m.angle, lambda m, v: m._set_constrained("raw_angle", v))
        if radius_prior is not None:
            self.register_prior("radius_prior", radius_prior, lambda m: m.radius, lambda m, v: m._set_constrained("raw_radius", v))

    @property
    def angle(self):
        return self._constrained("raw_angle")

    @angle.setter
    def angle(self, value):
        self._set_constrained("raw_angle", value)

    @property
    def radius(self):
        return self._constrained("raw_radius")

    @radius.setter
    def radius(self, value):
        self._set_constrained("raw_radius", value)

    def embedding(self, x):
        x_ = x / self.lengthscale
        angles = math.pi * self.angle * x_
        x_s = self.radius * jnp.sin(angles)
        x_c = self.radius * jnp.cos(angles)
        return jnp.concatenate([x_s, x_c], axis=-1)

    def forward(self, x1, x2, diag=False, last_dim_is_batch=False, **params):
        e1 = self.embedding(x1)
        e2 = self.embedding(x2)
        return self.base_kernel.forward(e1, e2, diag=diag, **params)


class CylindricalKernel(Kernel):
    """Decomposes inputs into radius × angle (reference: cylindrical_kernel.py:14;
    Oh et al. 2018 BOCK)."""

    def __init__(self, num_angular_weights: int, radial_base_kernel, eps: float = 1e-6, angular_weights_constraint=None, alpha_constraint=None, beta_constraint=None, **kwargs):
        super().__init__(**kwargs)
        self.num_angular_weights = int(num_angular_weights)
        self.radial_base_kernel = radial_base_kernel
        self.eps_val = float(eps)
        dt = self._param_dtype
        self.register_parameter(
            "raw_angular_weights", jnp.zeros(self.batch_shape + (num_angular_weights,), dtype=dt)
        )
        self.register_constraint("raw_angular_weights", angular_weights_constraint or Positive())
        self.register_parameter("raw_alpha", jnp.zeros(self.batch_shape + (1,), dtype=dt))
        self.register_constraint("raw_alpha", alpha_constraint or Interval(self.eps_val, 1.0))
        self.register_parameter("raw_beta", jnp.zeros(self.batch_shape + (1,), dtype=dt))
        self.register_constraint("raw_beta", beta_constraint or Positive())

    @property
    def angular_weights(self):
        return self._constrained("raw_angular_weights")

    @property
    def alpha(self):
        return self._constrained("raw_alpha")

    @property
    def beta(self):
        return self._constrained("raw_beta")

    def kuma(self, x):
        alpha = self.alpha[..., None]
        beta = self.beta[..., None]
        res = 1.0 - (1.0 - jnp.clip(x, self.eps_val, 1.0 - self.eps_val) ** alpha) ** beta
        return res

    def forward(self, x1, x2, diag=False, last_dim_is_batch=False, **params):
        r1 = jnp.linalg.norm(x1, axis=-1, keepdims=True)
        r2 = jnp.linalg.norm(x2, axis=-1, keepdims=True)
        a1 = x1 / jnp.maximum(r1, self.eps_val)
        a2 = x2 / jnp.maximum(r2, self.eps_val)
        if diag:
            cos_angle = jnp.sum(a1 * a2, axis=-1)
        else:
            cos_angle = a1 @ jnp.swapaxes(a2, -1, -2)
        cos_angle = jnp.clip(cos_angle, -1.0, 1.0)
        # angular kernel: Σ_p w_p cos_angle^p (Gegenbauer expansion)
        angular = jnp.zeros_like(cos_angle)
        w = self.angular_weights
        for p in range(self.num_angular_weights):
            wp = w[..., p]
            angular = angular + jnp.reshape(wp, wp.shape + (1,) * (cos_angle.ndim - wp.ndim)) * cos_angle**p
        radial = self.radial_base_kernel.forward(self.kuma(r1), self.kuma(r2), diag=diag, **params)
        from ..linop import LinearOperator

        if isinstance(radial, LinearOperator):
            radial = radial.to_dense() if not diag else radial._diagonal()
        return angular * radial


class GibbsKernel(Kernel):
    """Nonstationary RBF with input-dependent lengthscale function
    (reference: gibbs_kernel.py:13):
    k(x,x') = Π √(2ℓ(x)ℓ(x')/(ℓ(x)²+ℓ(x')²)) exp(−‖x−x'‖²/(ℓ(x)²+ℓ(x')²))."""

    def __init__(self, lengthscale_function: Optional[Callable] = None, **kwargs):
        super().__init__(**kwargs)
        if lengthscale_function is None:
            lengthscale_function = _ones_delta  # module-level default: keeps the kernel picklable
        self.lengthscale_function = lengthscale_function

    def forward(self, x1, x2, diag=False, last_dim_is_batch=False, **params):
        l1 = self.lengthscale_function(x1)  # (..., n)
        l2 = self.lengthscale_function(x2)  # (..., m)
        if diag:
            denom = l1**2 + l2**2
            d2 = jnp.sum((x1 - x2) ** 2, axis=-1)
            pref = jnp.sqrt(2.0 * l1 * l2 / denom)
            return pref * jnp.exp(-d2 / denom)
        denom = l1[..., :, None] ** 2 + l2[..., None, :] ** 2
        d2 = jnp.sum((x1[..., :, None, :] - x2[..., None, :, :]) ** 2, axis=-1)
        pref = jnp.sqrt(2.0 * l1[..., :, None] * l2[..., None, :] / denom)
        return pref * jnp.exp(-d2 / denom)


class HammingIMQKernel(Kernel):
    """Inverse-multi-quadratic kernel on the Hamming distance of one-hot sequences
    (reference: hamming_kernel.py:14): k = ((1+α)/(α+d_ham))^β."""

    def __init__(self, vocab_size: int, batch_shape=(), alpha_constraint=None, beta_constraint=None, dtype=jnp.float32, **kwargs):
        super().__init__(batch_shape=batch_shape, dtype=dtype, **kwargs)
        self.vocab_size = int(vocab_size)
        self.register_parameter("raw_alpha", jnp.zeros(self.batch_shape, dtype=dtype))
        self.register_constraint("raw_alpha", alpha_constraint or Positive())
        self.register_parameter("raw_beta", jnp.zeros(self.batch_shape, dtype=dtype))
        self.register_constraint("raw_beta", beta_constraint or Positive())

    @property
    def alpha(self):
        return self._constrained("raw_alpha")

    @alpha.setter
    def alpha(self, value):
        self._set_constrained("raw_alpha", value)

    @property
    def beta(self):
        return self._constrained("raw_beta")

    @beta.setter
    def beta(self, value):
        self._set_constrained("raw_beta", value)

    def forward(self, x1, x2, diag=False, last_dim_is_batch=False, **params):
        # inputs: one-hot flattened sequences (..., n, seq_len * vocab)
        seq_len = x1.shape[-1] // self.vocab_size
        x1r = x1.reshape(x1.shape[:-1] + (seq_len, self.vocab_size))
        x2r = x2.reshape(x2.shape[:-1] + (seq_len, self.vocab_size))
        if diag:
            matches = jnp.sum(jnp.sum(x1r * x2r, axis=-1), axis=-1)
        else:
            matches = jnp.einsum("...nsv,...msv->...nm", x1r, x2r)
        hamming = seq_len - matches
        alpha = self.alpha
        beta = self.beta
        extra = hamming.ndim - alpha.ndim
        alpha = jnp.reshape(alpha, alpha.shape + (1,) * extra)
        beta = jnp.reshape(beta, beta.shape + (1,) * extra)
        return ((1.0 + alpha) / (alpha + hamming)) ** beta


class SphericalLinearKernel(Kernel):
    """Linear (dot-product) kernel for inputs on a sphere via great-circle arcs
    (reference: spherical_linear_kernel.py:28): first-order arc kernel on normalized inputs."""

    has_lengthscale = False

    def forward(self, x1, x2, diag=False, last_dim_is_batch=False, **params):
        n1 = x1 / jnp.maximum(jnp.linalg.norm(x1, axis=-1, keepdims=True), 1e-12)
        n2 = x2 / jnp.maximum(jnp.linalg.norm(x2, axis=-1, keepdims=True), 1e-12)
        if diag:
            cos = jnp.clip(jnp.sum(n1 * n2, axis=-1), -1.0, 1.0)
        else:
            cos = jnp.clip(n1 @ jnp.swapaxes(n2, -1, -2), -1.0, 1.0)
        theta = jnp.arccos(cos)
        # order-1 arc-cosine style positive-definite function on the sphere
        return jnp.sin(theta) + (math.pi - theta) * cos


class DistributionalInputKernel(Kernel):
    """Kernel over input *distributions*: k = exp(−a·div(p, q))
    (reference: distributional_input_kernel.py:12)."""

    has_lengthscale = True

    def __init__(self, distance_function: Callable, **kwargs):
        super().__init__(**kwargs)
        if distance_function is None:
            raise RuntimeError("distance_function is required")
        self.distance_function = distance_function

    def forward(self, x1, x2, diag=False, last_dim_is_batch=False, **params):
        div = self.distance_function(x1, x2, diag=diag)
        ls = self.lengthscale[..., 0, 0]
        ls = jnp.reshape(ls, ls.shape + (1,) * (div.ndim - ls.ndim))
        return jnp.exp(-div / ls)


def _symmetrized_kl_distance(x1, x2, diag=False):
    """Inputs parameterize diagonal Gaussians: first half = means, second half = log-variances
    (reference: gaussian_symmetrized_kl_kernel.py:15-41)."""
    d = x1.shape[-1] // 2
    mu1, logv1 = x1[..., :d], x1[..., d:]
    mu2, logv2 = x2[..., :d], x2[..., d:]
    v1, v2 = jnp.exp(logv1), jnp.exp(logv2)

    def pair(m1, s1, m2, s2):
        # symmetrized KL between diagonal gaussians, summed over dims
        kl12 = 0.5 * ((s1 + (m1 - m2) ** 2) / s2 + jnp.log(s2) - jnp.log(s1) - 1.0)
        kl21 = 0.5 * ((s2 + (m1 - m2) ** 2) / s1 + jnp.log(s1) - jnp.log(s2) - 1.0)
        return jnp.sum(kl12 + kl21, axis=-1)

    if diag:
        return pair(mu1, v1, mu2, v2)
    return pair(
        mu1[..., :, None, :], v1[..., :, None, :], mu2[..., None, :, :], v2[..., None, :, :]
    )


class GaussianSymmetrizedKLKernel(DistributionalInputKernel):
    """Reference: gaussian_symmetrized_kl_kernel.py:42."""

    def __init__(self, **kwargs):
        super().__init__(distance_function=_symmetrized_kl_distance, **kwargs)


def hamming_dist(x1, x2, x1_eq_x2: bool = False):
    """Pairwise Hamming distances of one-hot sequences (reference: hamming_kernel.py:155-160)."""
    res = x1.shape[-2] - jnp.sum(x1[..., :, None, :, :] * x2[..., None, :, :, :], axis=(-1, -2))
    return jnp.maximum(res, 0.0)


def project_onto_unit_sphere(x):
    """Inverse stereographic projection (reference: spherical_linear_kernel.py:22-25)."""
    x_sq_norm = jnp.sum(jnp.square(x), axis=-1, keepdims=True)
    return jnp.concatenate([2 * x, x_sq_norm - 1.0], axis=-1) / (1.0 + x_sq_norm)
