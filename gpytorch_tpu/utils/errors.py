"""Error types (reference: gpytorch/utils/errors.py + linear_operator errors)."""


class CachingError(RuntimeError):
    pass


class NanError(RuntimeError):
    pass


class NotPSDError(RuntimeError):
    pass
