from .ngd import NGD, ngd
from .warm_start import WarmStartSchedule

__all__ = ["NGD", "WarmStartSchedule", "ngd"]
