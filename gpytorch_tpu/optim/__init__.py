from .ngd import NGD, ngd
from .warm_start import WarmStartSchedule, rhs_warm_context

__all__ = ["NGD", "WarmStartSchedule", "ngd", "rhs_warm_context"]
