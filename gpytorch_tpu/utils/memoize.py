"""Eager-mode memoization (reference: gpytorch/utils/memoize.py:12-145).

The reference caches method results on ``self._memoize_cache`` with kwargs-pickled keys and
clears them via backward hooks.  Backward hooks do not exist in JAX — the framework's
jit-facing caches are instead *explicit* pytree-excluded state (``Module._cache``, cleared
on ``set_train_data``/``train()``), which is the redesign SURVEY §7 calls for.

This decorator serves the remaining eager-mode use (prediction-strategy style caches built
OUTSIDE jit).  It stores results in ``self._cache`` — the same dict the Module system
already excludes from the pytree and invalidates on train/eval flips — keyed by the method
name and pickled arguments (reference ``_cached``, memoize.py:81-101).
"""

from __future__ import annotations

import functools
import pickle


def cached(method=None, name=None, ignore_args: bool = False):
    """Memoize a zero-side-effect method on ``self._cache`` (reference memoize.py:12-43).

    Usage matches the reference: ``@cached``, ``@cached(name="mean_cache")``, or
    ``@cached(name="k", ignore_args=True)``.
    """
    if method is None:
        return functools.partial(cached, name=name, ignore_args=ignore_args)

    @functools.wraps(method)
    def g(self, *args, **kwargs):
        cache = getattr(self, "_cache", None)
        if cache is None:
            cache = {}
            try:
                object.__setattr__(self, "_cache", cache)
            except Exception:  # slotted/frozen objects: fall through uncached
                return method(self, *args, **kwargs)
        cache_name = name if name is not None else method.__name__
        if ignore_args:
            key = cache_name
        else:
            key = (cache_name, pickle.dumps(args), pickle.dumps(kwargs))
        if key not in cache:
            cache[key] = method(self, *args, **kwargs)
        return cache[key]

    return g


def pop_from_cache(obj, name, *args, **kwargs):
    """Remove a cached value (reference memoize.py:104-118)."""
    cache = getattr(obj, "_cache", {})
    for key in list(cache):
        if key == name or (isinstance(key, tuple) and key and key[0] == name):
            del cache[key]


def clear_cache_hook(obj, *args, **kwargs):
    """Drop every memoized value (reference memoize.py:46)."""
    cache = getattr(obj, "_cache", None)
    if cache:
        cache.clear()
