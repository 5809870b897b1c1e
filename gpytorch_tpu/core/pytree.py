"""Shared pytree machinery for Modules and LinearOperators.

Both module trees (models) and operator trees (lazy matrices) are registered JAX pytrees whose
array-valued attributes are dynamic leaves and whose remaining attributes are static treedef
metadata.  This single mechanism is what makes whole GP models ``jit``/``grad``/``vmap``-able.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import numpy as np

# Types whose instances are dynamic (traced) pytree children.  Module and LinearOperator
# register themselves here at import time to avoid circular imports.
_DYNAMIC_BASES: list = [jax.Array, np.ndarray]


def register_dynamic_base(cls) -> None:
    _DYNAMIC_BASES.append(cls)


def is_dynamic(value: Any) -> bool:
    if isinstance(value, tuple(_DYNAMIC_BASES)):
        return True
    if isinstance(value, (list, tuple)):
        return any(is_dynamic(v) for v in value)
    if isinstance(value, dict):
        return any(is_dynamic(v) for v in value.values())
    return False


class Static:
    """Hashable wrapper for static attribute values stored in the treedef."""

    __slots__ = ("value",)

    def __init__(self, value: Any):
        self.value = value

    def __eq__(self, other):
        if not isinstance(other, Static):
            return NotImplemented
        try:
            return bool(self.value == other.value)
        except Exception:
            return self.value is other.value

    def __hash__(self):
        try:
            return hash(self.value)
        except TypeError:
            return hash(id(type(self.value)))

    def __repr__(self):
        return f"Static({self.value!r})"


class DictPyTree:
    """Base class: a pytree over ``__dict__`` with array attributes as leaves.

    Subclasses are automatically registered with ``jax.tree_util``.
    """

    _pytree_ignore: Tuple[str, ...] = ()

    def tree_flatten(self):
        d = object.__getattribute__(self, "__dict__")
        # Stability requirement: JAX internals unflatten with sentinel/None leaves and expect
        # re-flattening to produce the same structure.  An instance created by tree_unflatten
        # therefore remembers which keys were dynamic and reuses that classification.
        forced = d.get("_pytree_dynamic_keys", ())
        keys, children, static_keys, static_vals = [], [], [], []
        for k in sorted(d.keys()):
            if k in self._pytree_ignore or k == "_pytree_dynamic_keys":
                continue
            v = d[k]
            if k in forced or is_dynamic(v):
                keys.append(k)
                children.append(v)
            else:
                static_keys.append(k)
                static_vals.append(Static(v))
        return tuple(children), (tuple(keys), tuple(static_keys), tuple(static_vals))

    @classmethod
    def tree_unflatten(cls, aux, children):
        keys, static_keys, static_vals = aux
        obj = object.__new__(cls)
        d = object.__getattribute__(obj, "__dict__")
        for k, v in zip(keys, children):
            d[k] = v
        for k, w in zip(static_keys, static_vals):
            d[k] = w.value
        d["_pytree_dynamic_keys"] = frozenset(keys)
        for ign in cls._pytree_ignore:
            d.setdefault(ign, {})
        return obj

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        jax.tree_util.register_pytree_node_class(cls)
