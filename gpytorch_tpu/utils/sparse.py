"""Reference import-path shim: ``gpytorch.utils.sparse`` (reference: utils/sparse.py
forwards to linear_operator.utils.sparse).  The SKI sparse interpolation matvecs live in
:mod:`gpytorch_tpu.ops.interp`; ``dsmm`` is the package-level sparse-dense matmul."""

from ..ops.interp import left_interp, left_t_interp


def bdsmm(sparse, dense):
    """Batched sparse @ dense.  Our "sparse" operands are (indices, values) interpolation
    pairs — delegate to left_interp when given such a pair, else plain matmul."""
    import jax.numpy as jnp

    if isinstance(sparse, tuple) and len(sparse) == 2:
        idx, vals = sparse
        return left_interp(idx, vals, dense)
    return jnp.matmul(sparse, dense)


__all__ = ["left_interp", "left_t_interp", "bdsmm"]
