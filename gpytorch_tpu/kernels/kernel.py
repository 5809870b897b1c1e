"""Kernel base class (reference: gpytorch/kernels/kernel.py:84).

Covariance functions return dense arrays or structured LinearOperators; ``__call__`` returns a
LazyEvaluatedKernelOperator (reference :454-534) so K is never built until a solver asks.
Supports ARD lengthscales, ``active_dims``, parameter batching (``batch_shape``), priors and
constraints, and kernel composition via ``+`` / ``*`` (reference :541-551).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .. import settings
from ..constraints import Interval, Positive
from ..core.module import Module
from ..linop import LazyEvaluatedKernelOperator, LinearOperator, to_linear_operator
from ..ops.sq_dist import dist as _dist_op, sq_dist as _sq_dist_op

# re-exports matching the reference module-level helpers (kernel.py:26,52)
sq_dist = _sq_dist_op
dist = _dist_op


def default_postprocess_script(x):
    return x


class Distance:
    """Pairwise-distance helper (reference: kernel.py:64 — a torch.nn.Module there; a plain
    callable pair here, since the distance ops are stateless jnp functions)."""

    def __init__(self, postprocess=None):
        if postprocess is not None:
            import warnings

            warnings.warn(
                "The `postprocess` argument is deprecated. See the reference kernel.py:64.",
                DeprecationWarning,
            )
        self._postprocess = postprocess

    def _post(self, res):
        return self._postprocess(res) if self._postprocess is not None else res

    def _sq_dist(self, x1, x2, postprocess=False, x1_eq_x2=False):
        res = _sq_dist_op(x1, x2, x1_eq_x2)
        return self._post(res) if postprocess else res

    def _dist(self, x1, x2, postprocess=False, x1_eq_x2=False):
        res = _dist_op(x1, x2, x1_eq_x2)
        return self._post(res) if postprocess else res


class Kernel(Module):
    has_lengthscale = False

    def __init__(
        self,
        ard_num_dims: Optional[int] = None,
        batch_shape: Tuple[int, ...] = (),
        active_dims: Optional[Tuple[int, ...]] = None,
        lengthscale_prior=None,
        lengthscale_constraint=None,
        eps: float = 1e-6,
        dtype=jnp.float32,
    ):
        super().__init__()
        self.ard_num_dims = ard_num_dims
        self.batch_shape = tuple(batch_shape)
        self.active_dims = tuple(active_dims) if active_dims is not None else None
        self.eps = eps
        self._param_dtype = jnp.dtype(dtype)

        if self.has_lengthscale:
            lengthscale_num_dims = 1 if ard_num_dims is None else ard_num_dims
            self.register_parameter(
                "raw_lengthscale", jnp.zeros(self.batch_shape + (1, lengthscale_num_dims), dtype=dtype)
            )
            if lengthscale_constraint is None:
                lengthscale_constraint = Positive()
            self.register_constraint("raw_lengthscale", lengthscale_constraint)
            if lengthscale_prior is not None:
                self.register_prior(
                    "lengthscale_prior",
                    lengthscale_prior,
                    lambda m: m.lengthscale,
                    lambda m, v: m._set_lengthscale(v),
                )

    # -- lengthscale --------------------------------------------------------------------
    @property
    def lengthscale(self):
        if not self.has_lengthscale:
            return None
        return self._constrained("raw_lengthscale")

    @lengthscale.setter
    def lengthscale(self, value):
        self._set_lengthscale(value)

    def _set_lengthscale(self, value):
        if not self.has_lengthscale:
            raise RuntimeError("Kernel has no lengthscale")
        self._set_constrained("raw_lengthscale", value)

    @property
    def is_stationary(self) -> bool:
        return self.has_lengthscale

    @property
    def dtype(self):
        return self._param_dtype

    def num_outputs_per_input(self, x1, x2) -> int:
        """>1 for derivative-GP kernels (reference: kernel.py num_outputs_per_input)."""
        return 1

    # -- distance helpers ----------------------------------------------------------------
    def _scale_inputs(self, x1, x2):
        if self.has_lengthscale:
            ls = self.lengthscale  # (*batch, 1, d)
            return x1 / ls, x2 / ls
        return x1, x2

    def covar_dist(
        self,
        x1,
        x2,
        diag: bool = False,
        square_dist: bool = False,
        x1_eq_x2: Optional[bool] = None,
        **params,
    ):
        """Reference: kernel.py:307 — (scaled) pairwise distances."""
        if x1_eq_x2 is None:
            # only a cheap identity check — a value check would force device sync under jit
            x1_eq_x2 = x1 is x2
        if diag:
            d = x1 - x2
            res = jnp.sum(d * d, axis=-1)
            return res if square_dist else jnp.sqrt(jnp.maximum(res, 1e-30))
        return _sq_dist_op(x1, x2, x1_eq_x2) if square_dist else _dist_op(x1, x2, x1_eq_x2)

    # -- forward / call -------------------------------------------------------------------
    def forward(self, x1, x2, diag: bool = False, last_dim_is_batch: bool = False, **params):
        raise NotImplementedError

    def _expand_inputs(self, x1, x2):
        x1 = jnp.asarray(x1)
        if x1.ndim == 1:
            x1 = x1[:, None]
        if x2 is not None:
            x2 = jnp.asarray(x2)
            if x2.ndim == 1:
                x2 = x2[:, None]
        return x1, x2

    def __call__(self, x1, x2=None, diag: bool = False, last_dim_is_batch: bool = False, **params):
        x1, x2 = self._expand_inputs(x1, x2)
        x2_ = x1 if x2 is None else x2
        if self.active_dims is not None:
            ad = jnp.asarray(self.active_dims)
            x1 = jnp.take(x1, ad, axis=-1)
            x2_ = jnp.take(x2_, ad, axis=-1)
        if diag:
            settings._count_call("kernel_forward")
            res = self.forward(x1, x2_, diag=True, last_dim_is_batch=last_dim_is_batch, **params)
            return res.to_dense() if isinstance(res, LinearOperator) else res
        if settings.lazily_evaluate_kernels.on() and not settings.trace_mode.on():
            return LazyEvaluatedKernelOperator(self, x1, x2_, last_dim_is_batch=last_dim_is_batch)
        settings._count_call("kernel_forward")
        res = self.forward(x1, x2_, last_dim_is_batch=last_dim_is_batch, **params)
        return to_linear_operator(res)

    # -- composition ------------------------------------------------------------------------
    def __add__(self, other):
        kernels = []
        kernels += self.kernels if isinstance(self, AdditiveKernel) else [self]
        kernels += other.kernels if isinstance(other, AdditiveKernel) else [other]
        return AdditiveKernel(*kernels)

    def __mul__(self, other):
        kernels = []
        kernels += self.kernels if isinstance(self, ProductKernel) else [self]
        kernels += other.kernels if isinstance(other, ProductKernel) else [other]
        return ProductKernel(*kernels)

    def prediction_strategy(self, train_inputs, train_prior_dist, train_labels, likelihood):
        from ..models.exact_prediction_strategies import DefaultPredictionStrategy

        return DefaultPredictionStrategy(train_inputs, train_prior_dist, train_labels, likelihood)

    def __getitem__(self, index):
        """Index the kernel's batch dimensions (reference: kernel.py __getitem__).

        Composition kernels (Additive/Product/Scale) may themselves be unbatched while
        their children carry the batch dims — index any batched sub-kernel."""
        if not any(
            isinstance(mod, Kernel) and len(mod.batch_shape) > 0 for mod in self.modules()
        ):
            raise IndexError("Kernel has no batch dimensions to index")
        drop = 1 if isinstance(index, int) else sum(1 for ix in index if isinstance(ix, int)) if isinstance(index, tuple) else 0
        new = self.deepcopy()
        for mod in new.modules():
            if not isinstance(mod, Kernel) or len(mod.batch_shape) == 0:
                continue
            nb = len(mod.batch_shape)
            # only slice tensors that actually carry the batch dims (e.g. inducing_points
            # of an InducingPointKernel stay unbatched under a batched kernel)
            for pname in [
                p for p in mod._param_names
                if jnp.ndim(object.__getattribute__(mod, "__dict__")[p]) >= nb
                and object.__getattribute__(mod, "__dict__")[p].shape[:nb] == tuple(mod.batch_shape)
            ] + [
                b for b in getattr(mod, "_buffer_names", [])
                if object.__getattribute__(mod, "__dict__").get(b) is not None
                and object.__getattribute__(mod, "__dict__")[b].shape[:nb] == tuple(mod.batch_shape)
            ]:
                val = object.__getattribute__(mod, "__dict__")[pname]
                object.__getattribute__(mod, "__dict__")[pname] = val[index]
            new_batch = tuple(jnp.zeros(mod.batch_shape)[index].shape)
            mod.batch_shape = new_batch
        del drop
        return new


class AdditiveKernel(Kernel):
    """Sum of kernels (reference: kernel.py:592)."""

    def __init__(self, *kernels):
        super().__init__()
        self.kernels = list(kernels)

    @property
    def is_stationary(self):
        return all(k.is_stationary for k in self.kernels)

    def forward(self, x1, x2, diag=False, **params):
        # go through each child's __call__ so per-child active_dims apply (reference :592
        # sums lazily-evaluated child kernels)
        res = None
        for k in self.kernels:
            nxt = k(x1, x2, diag=diag, **params)
            if not diag:
                nxt = nxt.evaluate_kernel() if hasattr(nxt, "evaluate_kernel") else nxt
            elif isinstance(nxt, LinearOperator):
                nxt = nxt.to_dense()
            res = nxt if res is None else (res + nxt)
        return res

    def num_outputs_per_input(self, x1, x2):
        return self.kernels[0].num_outputs_per_input(x1, x2)


class ProductKernel(Kernel):
    """Elementwise product of kernels (reference: kernel.py:634)."""

    def __init__(self, *kernels):
        super().__init__()
        self.kernels = list(kernels)

    @property
    def is_stationary(self):
        return all(k.is_stationary for k in self.kernels)

    def forward(self, x1, x2, diag=False, **params):
        # go through each child's __call__ so per-child active_dims apply (reference :634)
        res = None
        for k in self.kernels:
            nxt = k(x1, x2, diag=diag, **params)
            if isinstance(nxt, LinearOperator):
                nxt = nxt.to_dense() if not diag else nxt._diagonal()
            res = nxt if res is None else res * nxt

        return res

    def num_outputs_per_input(self, x1, x2):
        return self.kernels[0].num_outputs_per_input(x1, x2)
