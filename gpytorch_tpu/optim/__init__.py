from .ngd import NGD, ngd

__all__ = ["NGD", "ngd"]
