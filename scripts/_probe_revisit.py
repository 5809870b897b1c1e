"""Probe: does Mosaic support ACCUMULATING into an aliased output block whose index map
revisits blocks non-consecutively across the grid?  (Decides the symmetric-matvec design:
out_b[j] += K_ijT v_i with j revisited for every i.)"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

interpret = "--interpret" in sys.argv
if interpret:
    jax.config.update("jax_platforms", "cpu")

P, B = 4, 256  # 4 blocks of 256 (2 sublane tiles x 128 lanes when viewed 2D)


def kern(acc_ref, x_ref, out_ref):
    # out block index = j; for each grid step (i, j) add x block i.
    out_ref[:] = acc_ref[:] + x_ref[:]


x = jnp.arange(P * B, dtype=jnp.float32).reshape(P, B)
zeros = jnp.zeros((P, B), jnp.float32)

out = pl.pallas_call(
    kern,
    grid=(P, P),
    in_specs=[
        pl.BlockSpec((1, B), lambda i, j: (j, 0)),  # aliased accumulator, j-indexed
        pl.BlockSpec((1, B), lambda i, j: (i, 0)),  # x block, i-indexed
    ],
    out_specs=pl.BlockSpec((1, B), lambda i, j: (j, 0)),
    out_shape=jax.ShapeDtypeStruct((P, B), jnp.float32),
    input_output_aliases={0: 0},
    interpret=interpret,
)(zeros, x)

expect = jnp.broadcast_to(jnp.sum(x, axis=0), (P, B))
ok = bool(jnp.allclose(out, expect))
print({"revisit_aliased_accumulate_ok": ok})
if not ok:
    print("got row sums:", np.asarray(out[:, 0]), "expect:", float(jnp.sum(x[:, 0])))
print("PROBE DONE")
