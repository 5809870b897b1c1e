"""Warning taxonomy (reference: gpytorch/utils/warnings.py)."""


class GPInputWarning(UserWarning):
    """Input mismatch warnings (e.g. eval-mode call on training inputs)."""


class NumericalWarning(RuntimeWarning):
    """Numerical stability warnings (jitter added, CG not converged, ...)."""


class OldVersionWarning(UserWarning):
    """Loading a state dict from an old version."""


class TracedProbeKeyWarning(UserWarning):
    """A jitted objective drew SLQ probe vectors without an explicit PRNG key.

    The host-side fresh-probe counter is read at TRACE time, so every re-execution of the
    compiled step silently reuses the same probes — a biased logdet-gradient estimator the
    reference never produces (its default is fresh probes per call).  Pass a per-step key,
    e.g. ``mll(output, y, key=k)``, or opt into ``settings.deterministic_probes`` to
    acknowledge frozen probes."""
