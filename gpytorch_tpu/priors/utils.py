"""Prior (de)serialization helpers (reference: gpytorch/priors/utils.py).

The reference bufferizes torch TransformedDistribution attributes so priors round-trip
through state_dicts; our priors are pytree Modules whose parameters already serialize, so
these helpers reduce to attribute copies kept for API parity."""

BUFFERED_PREFIX = "_buffered_"


def _bufferize_attributes(module, attributes):
    for attr in attributes:
        value = getattr(module, attr)
        if hasattr(module, "register_buffer"):
            try:
                delattr(module, attr)
            except AttributeError:
                pass
            module.register_buffer(attr, value)


def _load_transformed_to_base_dist(module):
    for attr in dir(module):
        if attr.startswith(BUFFERED_PREFIX):
            setattr(module, attr[len(BUFFERED_PREFIX):], getattr(module, attr))
    return module


def _del_attributes(module, attributes, raise_on_error=False):
    for attr in attributes:
        try:
            delattr(module, attr)
        except AttributeError:
            if raise_on_error:
                raise
    return module


__all__ = ["_bufferize_attributes", "_load_transformed_to_base_dist", "_del_attributes"]
