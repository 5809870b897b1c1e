from .constraints import GreaterThan, Interval, LessThan, Positive, inv_sigmoid, inv_softplus

__all__ = ["GreaterThan", "Interval", "LessThan", "Positive", "inv_sigmoid", "inv_softplus"]
