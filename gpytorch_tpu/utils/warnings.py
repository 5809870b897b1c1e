"""Warning taxonomy (reference: gpytorch/utils/warnings.py)."""


class GPInputWarning(UserWarning):
    """Input mismatch warnings (e.g. eval-mode call on training inputs)."""


class NumericalWarning(RuntimeWarning):
    """Numerical stability warnings (jitter added, CG not converged, ...)."""


class OldVersionWarning(UserWarning):
    """Loading a state dict from an old version."""
