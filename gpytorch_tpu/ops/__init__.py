from .interp import left_interp, left_t_interp
from .sq_dist import dist, sq_dist
from .toeplitz import sym_toeplitz_matmul

__all__ = ["dist", "left_interp", "left_t_interp", "sq_dist", "sym_toeplitz_matmul"]
