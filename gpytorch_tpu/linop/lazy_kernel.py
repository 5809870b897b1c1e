"""LazyEvaluatedKernelOperator — defers kernel evaluation until a solver asks for it.

Reference: gpytorch/lazy/lazy_evaluated_kernel_tensor.py:33.  Stores (kernel, x1, x2); slicing
(``__getitem__``) slices the *inputs* (reference :136), so the exact-GP joint train/test
covariance never rebuilds K(train,train) at test time (reference models/exact_gp.py:355-429).

``_matmul`` streams K·v in row blocks (the default here — the reference's
``checkpoint_kernel`` beta feature, lazy_evaluated_kernel_tensor.py:245-275) so CG never
materializes K when N is large; for supported stationary kernels it dispatches to the fused
Pallas kernel matvec (the KeOps analogue).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .. import settings
from .base import DenseLinearOperator, LinearOperator, to_linear_operator

# row-block size for streamed matvecs; multiple of the 8×128 f32 tile
_CHUNK = 4096


class LazyEvaluatedKernelOperator(LinearOperator):
    def __init__(self, kernel, x1, x2, last_dim_is_batch: bool = False):
        self.kernel = kernel
        self.x1 = jnp.asarray(x1)
        self.x2 = jnp.asarray(x2)
        self.last_dim_is_batch = bool(last_dim_is_batch)

    def _is_known_psd(self) -> bool:
        # K(X, X) of a valid kernel is PSD; cross-covariances K(X, Z) are not (not even
        # square).  `x1 is x2` is how symmetric evaluation is constructed (Kernel.__call__
        # with one input) — conservative for genuinely equal-but-distinct arrays.
        return self.x1 is self.x2

    # -- shape ------------------------------------------------------------------------
    def _shape(self):
        num_out = self.kernel.num_outputs_per_input(self.x1, self.x2)
        batch = jnp.broadcast_shapes(self.x1.shape[:-2], self.x2.shape[:-2], tuple(self.kernel.batch_shape))
        n = self.x1.shape[-2] * num_out
        m = self.x2.shape[-2] * num_out
        if self.last_dim_is_batch:
            batch = batch + (self.x1.shape[-1],)
        return tuple(batch) + (n, m)

    @property
    def dtype(self):
        return self.x1.dtype

    # -- evaluation --------------------------------------------------------------------
    def evaluate_kernel(self) -> LinearOperator:
        """Run the kernel forward non-lazily (reference :344).

        Large plain-dense kernels stay lazy (their ``_matmul`` streams, Pallas-fused where
        possible) — only kernels that return *structured* operators (SKI, SGPR, linear/RFF,
        grid, multitask) are always evaluated, since their structure unlocks closed-form
        solves regardless of size.
        """
        n, m = self.shape[-2:]
        big = n * m > settings.max_eager_kernel_size.value() ** 2
        # settings.memory_efficient (reference settings.py:272): never materialize plain
        # kernels regardless of size — everything streams through the fused/chunked matvec
        if settings.memory_efficient.on() and not self.last_dim_is_batch:
            big = True
        if big and not getattr(self.kernel, "returns_lazy_structure", False):
            return self
        settings._count_call("kernel_forward")
        with settings.lazily_evaluate_kernels(False):
            res = self.kernel.forward(self.x1, self.x2, last_dim_is_batch=self.last_dim_is_batch)
        return to_linear_operator(res)

    def to_dense(self):
        res = self.evaluate_kernel()
        if res is self:
            # over the eager-size policy threshold, but densification was explicitly
            # requested — run the kernel forward directly (no recursion through the policy)
            with settings.lazily_evaluate_kernels(False):
                out = self.kernel.forward(self.x1, self.x2, last_dim_is_batch=self.last_dim_is_batch)
            return out.to_dense() if isinstance(out, LinearOperator) else out
        return res.to_dense()

    def _diagonal(self):
        if self.x1.shape == self.x2.shape:
            with settings.lazily_evaluate_kernels(False):
                res = self.kernel.forward(self.x1, self.x2, diag=True, last_dim_is_batch=self.last_dim_is_batch)
            if isinstance(res, LinearOperator):
                return res.to_dense()
            return res
        return self.evaluate_kernel()._diagonal()

    def _matmul(self, rhs):
        n, m = self.shape[-2:]
        small = n * m <= settings.max_eager_kernel_size.value() ** 2
        if (small and not settings.memory_efficient.on()) or self.last_dim_is_batch:
            return self.evaluate_kernel()._matmul(rhs)
        fused = self._try_fused_matvec(rhs)
        if fused is not None:
            return fused
        return self._matmul_chunked(rhs)

    def _try_fused_matvec(self, rhs):
        """Dispatch to the Pallas streaming kernel matvec (the KeOps analogue) for
        (Scale)(RBF|Matern|Periodic) kernels; batched kernels map the fused op over the
        flattened batch (reference KeOps handles batching the same way — one launch per
        batch element)."""
        from ..ops import pallas_kernels as pk

        kernel = self.kernel
        outputscale = None
        from ..kernels.scale_kernel import ScaleKernel
        from ..kernels.stationary import PeriodicKernel

        if isinstance(kernel, ScaleKernel):
            outputscale = kernel.outputscale
            kernel = kernel.base_kernel
        periodic = type(kernel) is PeriodicKernel
        ktype = None if periodic else pk.kernel_type_for(kernel)
        if ktype is None and not periodic:
            return None
        ls = kernel.lengthscale  # (*b, 1, d) or (*b, 1, 1)
        if ls is None:
            return None

        if self.batch_shape == () and rhs.ndim == 2 and ls.ndim == 2:
            return self._fused_single(kernel, ktype, periodic, ls, self.x1, self.x2, rhs, outputscale)

        # batched path: broadcast everything to the full batch and map the fused op
        batch = self.batch_shape
        if rhs.shape[:-2] != batch:
            return None
        d = self.x1.shape[-1]
        x1 = jnp.broadcast_to(self.x1, batch + self.x1.shape[-2:]).reshape((-1,) + self.x1.shape[-2:])
        x2 = jnp.broadcast_to(self.x2, batch + self.x2.shape[-2:]).reshape((-1,) + self.x2.shape[-2:])
        ls_b = jnp.broadcast_to(ls, batch + (1, ls.shape[-1])).reshape((-1, 1, ls.shape[-1]))
        rhs_b = rhs.reshape((-1,) + rhs.shape[-2:])
        os_b = None
        if outputscale is not None:
            if periodic:
                # periodic keeps rhs-side association (its VJP always computes dv)
                os_flat = jnp.broadcast_to(outputscale, batch).reshape((-1,))
                rhs_b = rhs_b * os_flat[:, None, None]
            else:
                # σ² rides the scaled primitive per batch element (see _fused_single)
                os_b = jnp.broadcast_to(outputscale, batch).reshape((-1,))
        if periodic:
            per = jnp.broadcast_to(kernel.period_length, batch + (1, kernel.period_length.shape[-1]))
            per = per.reshape((-1, 1, kernel.period_length.shape[-1]))
        sym = self.x1 is self.x2  # symmetric case: pass ONE scaled tracer twice so the
        # fused VJP's one-pass ``x1 is x2`` branch fires (see _fused_single)

        def one(args):
            if periodic:
                x1i, x2i, lsi, ri, peri = args[:5]
                if sym:
                    xsi = x1i / peri
                    out = pk.fused_periodic_matvec(xsi, xsi, 1.0 / (lsi[0] ** 2), ri)
                else:
                    out = pk.fused_periodic_matvec(x1i / peri, x2i / peri, 1.0 / (lsi[0] ** 2), ri)
            else:
                x1i, x2i, lsi, ri = args[:4]
                center = jax.lax.stop_gradient(jnp.mean(x1i, axis=-2, keepdims=True))
                osi = args[4] if os_b is not None else None
                # grad-only twins: primal dead at the call site (mBCG backward) — skip
                # the Pallas pass, keep the VJP (settings.matvec_grad_only)
                _go = settings.matvec_grad_only.on()
                _scaled = pk.fused_scaled_kernel_matvec_grad_only if _go else pk.fused_scaled_kernel_matvec
                _plain = pk.fused_kernel_matvec_grad_only if _go else pk.fused_kernel_matvec
                if sym:
                    xsi = (x1i - center) / lsi
                    if osi is not None:
                        out = _scaled(xsi, xsi, ri, osi, ktype)
                    else:
                        out = _plain(xsi, xsi, ri, ktype)
                else:
                    xs1i, xs2i = (x1i - center) / lsi, (x2i - center) / lsi
                    if osi is not None:
                        out = _scaled(xs1i, xs2i, ri, osi, ktype)
                    else:
                        out = _plain(xs1i, xs2i, ri, ktype)
            return out

        args = (x1, x2, ls_b, rhs_b) + ((per,) if periodic else ()) + (
            (os_b,) if os_b is not None else ()
        )
        outs = jax.lax.map(one, args)
        return outs.reshape(batch + outs.shape[-2:])

    def _fused_single(self, kernel, ktype, periodic, ls, x1, x2, rhs, outputscale):
        from ..ops import pallas_kernels as pk

        # Symmetric (training) case: scale the inputs ONCE and pass the SAME traced value
        # twice — the fused VJP's one-pass branch keys on ``x1 is x2`` (object identity of
        # the tracers), and evaluating ``(x1 - center) / ls`` as two expressions silently
        # demoted every training backward to the general three-pass branch (dv matvec +
        # two dx passes, ~115 ms/step at N=100k vs ~63 ms for the one-pass kernel).
        if periodic:
            # periodic: σ² stays associated onto the rhs (σ²_bar = Σ v⊙dv — its fused VJP
            # always computes dv; skip_matvec_cotangent is not wired into it)
            if outputscale is not None:
                rhs = rhs * outputscale
            per = kernel.period_length
            if x1 is x2:
                xs = x1 / per
                out = pk.fused_periodic_matvec(xs, xs, 1.0 / (ls[0] ** 2), rhs)
            else:
                out = pk.fused_periodic_matvec(x1 / per, x2 / per, 1.0 / (ls[0] ** 2), rhs)
        else:
            # ScaleKernel σ² rides the SCALED primitive: its VJP reads σ²_bar out of the
            # fused backward kernel's Σ kv⊙gv accumulator — no primal K·v resurrection,
            # no dv product (which settings.skip_matvec_cotangent deletes in the mBCG
            # backward; rhs-side association would have routed σ²_bar through that
            # deleted dv and silently zeroed the outputscale gradient)
            center = jax.lax.stop_gradient(jnp.mean(x1, axis=-2, keepdims=True))
            # grad-only twins: primal dead at the call site (mBCG backward) — skip the
            # Pallas pass, keep the VJP (settings.matvec_grad_only)
            _go = settings.matvec_grad_only.on()
            _scaled = pk.fused_scaled_kernel_matvec_grad_only if _go else pk.fused_scaled_kernel_matvec
            _plain = pk.fused_kernel_matvec_grad_only if _go else pk.fused_kernel_matvec
            if x1 is x2:
                xs = (x1 - center) / ls
                if outputscale is not None:
                    out = _scaled(xs, xs, rhs, outputscale, ktype)
                else:
                    out = _plain(xs, xs, rhs, ktype)
            else:
                xs1, xs2 = (x1 - center) / ls, (x2 - center) / ls
                if outputscale is not None:
                    out = _scaled(xs1, xs2, rhs, outputscale, ktype)
                else:
                    out = _plain(xs1, xs2, rhs, ktype)
        return out

    def _matmul_chunked(self, rhs):
        """Stream K·v by row blocks of x1 — never materializes the full kernel matrix."""
        num_out = self.kernel.num_outputs_per_input(self.x1, self.x2)
        if num_out != 1:
            return self.evaluate_kernel()._matmul(rhs)
        n = self.x1.shape[-2]
        chunk = min(_CHUNK, n)
        pad = (-n) % chunk
        x1p = jnp.concatenate([self.x1, jnp.zeros(self.x1.shape[:-2] + (pad, self.x1.shape[-1]), self.x1.dtype)], axis=-2) if pad else self.x1
        num_chunks = x1p.shape[-2] // chunk
        batch = self.batch_shape
        out_cols = rhs.shape[-1]

        def block(i):
            x1_blk = jax.lax.dynamic_slice_in_dim(x1p, i * chunk, chunk, axis=-2)
            with settings.lazily_evaluate_kernels(False):
                K_blk = self.kernel.forward(x1_blk, self.x2)
            K_blk = to_linear_operator(K_blk) if isinstance(K_blk, LinearOperator) else DenseLinearOperator(K_blk)
            return K_blk._matmul(rhs)

        outs = jax.lax.map(block, jnp.arange(num_chunks))  # (num_chunks, *batch, chunk, k)
        outs = jnp.moveaxis(outs, 0, -3)  # (*batch, num_chunks, chunk, k)
        outs = outs.reshape(outs.shape[:-3] + (num_chunks * chunk, out_cols))
        return outs[..., :n, :]

    def _t_matmul(self, rhs):
        return self._transpose()._matmul(rhs)

    def _transpose(self):
        return LazyEvaluatedKernelOperator(self.kernel, self.x2, self.x1, self.last_dim_is_batch)

    def _get_rows(self, idx):
        num_out = self.kernel.num_outputs_per_input(self.x1, self.x2)
        if num_out != 1:
            return super()._get_rows(idx)
        batch = self.x1.shape[:-2]
        idx_b = jnp.broadcast_to(idx, batch + idx.shape[-1:])
        x1_rows = jnp.take_along_axis(self.x1, idx_b[..., :, None], axis=-2)
        with settings.lazily_evaluate_kernels(False):
            rows = self.kernel.forward(x1_rows, self.x2)
        if isinstance(rows, LinearOperator):
            rows = rows.to_dense()
        return rows

    def __getitem__(self, index):
        """Slice inputs instead of the kernel matrix (reference :136)."""
        if not isinstance(index, tuple):
            index = (index,)
        if len(index) >= 2 and isinstance(index[-1], slice) and isinstance(index[-2], slice):
            row_ix, col_ix = index[-2], index[-1]
            batch_ix = index[:-2]
            num_out = self.kernel.num_outputs_per_input(self.x1, self.x2)
            if num_out == 1:
                x1 = self.x1[batch_ix + (row_ix, slice(None))] if batch_ix else self.x1[..., row_ix, :]
                x2 = self.x2[batch_ix + (col_ix, slice(None))] if batch_ix else self.x2[..., col_ix, :]
                return LazyEvaluatedKernelOperator(self.kernel, x1, x2, self.last_dim_is_batch)
        return super().__getitem__(index)

    def add_jitter(self, jitter_val: float = 1e-3):
        res = self.evaluate_kernel()
        if res is self:
            # over the eager-size policy threshold (evaluate_kernel kept the operator
            # lazy) — wrap directly instead of recursing forever
            return super().add_jitter(jitter_val)
        return res.add_jitter(jitter_val)
