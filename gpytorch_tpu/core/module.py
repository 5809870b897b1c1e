"""Pytree-based Module system — the TPU-native analogue of GPyTorch's ``gpytorch/module.py``.

The reference builds on ``torch.nn.Module`` (reference: gpytorch/module.py:70) and adds
raw/constrained parameter handling, priors, and added-loss terms.  JAX has no stateful module
system, so we use an equinox-style design: every :class:`Module` is a registered pytree whose
array-valued attributes are dynamic leaves and whose other attributes are static treedef
metadata.  This makes whole models directly compatible with ``jax.jit`` / ``jax.grad`` /
``jax.vmap`` — ``jax.grad(loss)(model)`` returns a model-shaped tree of gradients.

Key differences from the reference, by design (TPU/XLA idioms):
  * Parameters are stored *raw* (unconstrained); constraints are static bijectors applied on
    read (mirrors reference ``raw_*`` convention, gpytorch/module.py:329).
  * Mutation (``module.initialize(...)``, attribute assignment) is allowed *outside* jit;
    inside jit use the functional views (:meth:`trainable_params` / :meth:`with_params`).
  * Caches (prediction strategies etc.) live in ``self._cache`` which is *excluded* from the
    pytree so they never leak into traced state.
"""

from __future__ import annotations

import copy
import dataclasses
from typing import Any, Callable, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .pytree import DictPyTree, Static as _Static, is_dynamic as _is_dynamic, register_dynamic_base

ArrayTypes = (jax.Array, np.ndarray)


class Module(DictPyTree):
    """Base class for all parameterized components (kernels, means, likelihoods, models).

    Mirrors the surface of the reference ``gpytorch.Module`` (gpytorch/module.py:70):
    ``register_parameter`` (:238), ``register_prior`` (:250), ``register_constraint`` (:329),
    ``initialize`` (:122), ``named_parameters``, ``train``/``eval``, ``hyperparameters``.
    """

    # Attribute names never included in the pytree (per-class extendable).
    _pytree_ignore: Tuple[str, ...] = ("_cache",)

    def __init__(self):
        d = object.__getattribute__(self, "__dict__")
        d.setdefault("_param_names", [])        # registered raw parameter attribute names
        d.setdefault("_buffer_names", [])       # registered non-trainable array attribute names
        d.setdefault("_constraints", {})        # param name -> constraint (static bijector)
        d.setdefault("_priors", {})             # prior name -> (param_or_closure_name, prior, setting_name)
        d.setdefault("_added_loss_terms", {})
        d.setdefault("training", True)
        d.setdefault("_cache", {})

    # -- parameter / constraint / prior registration ------------------------------------
    def register_parameter(self, name: str, value) -> None:
        """Register a raw (unconstrained) parameter (reference: gpytorch/module.py:238)."""
        d = object.__getattribute__(self, "__dict__")
        d[name] = jnp.asarray(value)
        if name not in self._param_names:
            self._param_names.append(name)

    def register_buffer(self, name: str, value) -> None:
        d = object.__getattribute__(self, "__dict__")
        d[name] = None if value is None else jnp.asarray(value)
        if name not in d["_buffer_names"]:
            d["_buffer_names"].append(name)

    def register_constraint(self, param_name: str, constraint, replace: bool = True) -> None:
        """Attach a static bijector to a raw parameter (reference: gpytorch/module.py:329)."""
        if param_name not in self._param_names:
            raise RuntimeError(f"Attempting to register constraint for nonexistent parameter {param_name!r}.")
        existing = self._constraints.get(param_name)
        if existing is not None and not replace:
            constraint = existing.intersect(constraint)
        self._constraints[param_name] = constraint

    def constraint_for_parameter_name(self, param_name: str):
        """Look up the constraint for a dotted parameter path (reference: gpytorch/module.py:357)."""
        module, leaf = self._resolve(param_name)
        return module._constraints.get(leaf)

    def register_prior(self, name: str, prior, param_or_closure, setting_closure=None) -> None:
        """Attach a prior to a parameter or derived quantity (reference: gpytorch/module.py:250).

        ``param_or_closure`` is a parameter *name* (string) or a callable ``m -> value``.
        ``setting_closure`` is an optional callable ``(m, value) -> None`` used by
        ``sample_from_prior`` / ``initialize(name=value)``.
        """
        if isinstance(param_or_closure, str):
            if param_or_closure not in self._param_names and not hasattr(self, param_or_closure):
                raise AttributeError(f"Unknown parameter {param_or_closure!r} for prior {name!r}")
        self._priors[name] = (param_or_closure, setting_closure)
        d = object.__getattribute__(self, "__dict__")
        d[name] = prior  # prior is a Module → part of the pytree (its hyperparams are leaves)

    def register_added_loss_term(self, name: str) -> None:
        self._added_loss_terms[name] = None

    def update_added_loss_term(self, name: str, added_loss_term) -> None:
        if name not in self._added_loss_terms:
            raise RuntimeError(f"added_loss_term {name!r} not registered")
        self._added_loss_terms[name] = added_loss_term

    def added_loss_terms(self) -> Iterator:
        for module in self.modules():
            for term in module._added_loss_terms.values():
                if term is not None:
                    yield term

    # -- traversal -----------------------------------------------------------------------
    def children(self) -> Iterator["Module"]:
        for _, child in self.named_children():
            yield child

    def named_children(self) -> Iterator[Tuple[str, "Module"]]:
        d = object.__getattribute__(self, "__dict__")
        for k in sorted(d.keys()):
            if k in self._pytree_ignore:  # excluded refs (e.g. back-pointers) — not children
                continue
            v = d[k]
            if isinstance(v, Module):
                yield k, v
            elif isinstance(v, (list, tuple)):
                for i, item in enumerate(v):
                    if isinstance(item, Module):
                        yield f"{k}.{i}", item

    def modules(self) -> Iterator["Module"]:
        yield self
        for child in self.children():
            yield from child.modules()

    def named_modules(self, prefix: str = "") -> Iterator[Tuple[str, "Module"]]:
        yield prefix, self
        for name, child in self.named_children():
            sub = f"{prefix}.{name}" if prefix else name
            yield from child.named_modules(sub)

    def named_parameters(self) -> Iterator[Tuple[str, jax.Array]]:
        for mod_name, module in self.named_modules():
            for p in module._param_names:
                full = f"{mod_name}.{p}" if mod_name else p
                yield full, object.__getattribute__(module, "__dict__")[p]

    def parameters(self) -> Iterator[jax.Array]:
        for _, v in self.named_parameters():
            yield v

    def named_priors(self) -> Iterator[Tuple[str, "Module", Any, Callable, Optional[Callable]]]:
        """Yield (name, module, prior, closure, setting_closure) (reference: gpytorch/module.py:!named_priors)."""
        for mod_name, module in self.named_modules():
            for prior_name, (param_or_closure, setting_closure) in module._priors.items():
                prior = object.__getattribute__(module, "__dict__")[prior_name]
                if isinstance(param_or_closure, str):
                    pname = param_or_closure
                    closure = lambda m, _p=pname: getattr(m, _p)
                else:
                    closure = param_or_closure
                full = f"{mod_name}.{prior_name}" if mod_name else prior_name
                yield full, module, prior, closure, setting_closure

    def prior_log_prob_sum(self):
        """Sum of prior log-probs over all registered priors (used by the exact MLL)."""
        total = None
        for _, module, prior, closure, _ in self.named_priors():
            lp = jnp.sum(prior.log_prob(closure(module)))
            total = lp if total is None else total + lp
        return total

    # -- functional parameter views -------------------------------------------------------
    def _resolve(self, dotted: str) -> Tuple["Module", str]:
        parts = dotted.split(".")
        module: Module = self
        for part in parts[:-1]:
            if part.isdigit():
                # list/tuple child containers (e.g. AdditiveKernel.kernels.0)
                module = module[int(part)] if not isinstance(module, Module) else None
                if module is None:
                    raise KeyError(f"Cannot resolve list index in path {dotted!r}")
                continue
            d = object.__getattribute__(module, "__dict__") if isinstance(module, Module) else None
            if d is None:
                raise KeyError(f"Cannot resolve path {dotted!r}")
            module = d[part]
        return module, parts[-1]

    def trainable_params(self) -> Dict[str, jax.Array]:
        """Flat dict of dotted-name -> raw parameter value (functional training view)."""
        return dict(self.named_parameters())

    def with_params(self, params: Dict[str, jax.Array]) -> "Module":
        """Return a copy of this module with raw parameters replaced from ``params``."""
        new = jax.tree_util.tree_map(lambda x: x, self)  # structural copy
        for dotted, value in params.items():
            module, leaf = new._resolve(dotted)
            object.__getattribute__(module, "__dict__")[leaf] = value
        return new

    # -- constrained access ----------------------------------------------------------------
    def _constrained(self, raw_name: str) -> jax.Array:
        raw = object.__getattribute__(self, "__dict__")[raw_name]
        constraint = self._constraints.get(raw_name)
        return constraint.transform(raw) if constraint is not None else raw

    def _set_constrained(self, raw_name: str, value) -> None:
        constraint = self._constraints.get(raw_name)
        value = jnp.asarray(value, dtype=object.__getattribute__(self, "__dict__")[raw_name].dtype)
        # eager out-of-support values fail loudly instead of silently becoming NaN/−inf raws
        # (reference: initialize raises "Value must lie within constraint", module.py:122);
        # values AT a bound are nudged just inside the open interval (a boundary raw is ±inf)
        if constraint is not None and not isinstance(value, jax.core.Tracer):
            if not constraint.check(value):
                import math as _math

                lo, hi = constraint.lower_bound, constraint.upper_bound
                at_boundary = bool(jnp.all(value >= lo) and jnp.all(value <= hi))
                if not at_boundary:
                    raise ValueError(
                        f"Value for parameter {raw_name!r} must lie within {constraint!r}"
                    )
                lo_in = lo + abs(lo) * 1e-3 + 1e-30 if _math.isfinite(lo) else lo
                hi_in = hi - abs(hi) * 1e-3 - 1e-30 if _math.isfinite(hi) else hi
                value = jnp.clip(value, lo_in, hi_in)
        raw_cur = object.__getattribute__(self, "__dict__")[raw_name]
        # shape-tolerant: values may carry extra leading (sample/batch) dims — the parameter
        # grows (reference: load_strict_shapes(False), gpytorch/module.py:396)
        value = jnp.broadcast_to(value, jnp.broadcast_shapes(value.shape, raw_cur.shape))
        raw = constraint.inverse_transform(value) if constraint is not None else value
        object.__getattribute__(self, "__dict__")[raw_name] = raw

    def initialize(self, **kwargs) -> "Module":
        """Set (constrained) parameter values in place (reference: gpytorch/module.py:122)."""
        for name, value in kwargs.items():
            if "." in name:
                module, leaf = self._resolve(name)
                module.initialize(**{leaf: value})
                continue
            if name in self._priors:
                _, setting_closure = self._priors[name]
                if setting_closure is None:
                    raise RuntimeError(f"Cannot set prior-derived value {name!r} without a setting_closure")
                setting_closure(self, jnp.asarray(value))
            elif name in self._param_names:
                object.__getattribute__(self, "__dict__")[name] = jnp.broadcast_to(
                    jnp.asarray(value, dtype=object.__getattribute__(self, "__dict__")[name].dtype),
                    object.__getattribute__(self, "__dict__")[name].shape,
                )
            elif name.startswith("raw_") is False and f"raw_{name}" in self._param_names:
                self._set_constrained(f"raw_{name}", value)
            elif hasattr(self, name):
                object.__getattribute__(self, "__dict__")[name] = jnp.asarray(value)
            else:
                raise AttributeError(f"Unknown parameter {name!r} for {type(self).__name__}")
        self.clear_caches()
        return self

    def sample_from_prior(self, prior_name: str, key) -> "Module":
        """Sample a registered prior and write it back via its setting closure."""
        if prior_name not in self._priors:
            raise RuntimeError(f"Unknown prior {prior_name!r}")
        param_or_closure, setting_closure = self._priors[prior_name]
        if setting_closure is None and not isinstance(param_or_closure, str):
            raise RuntimeError(f"Prior {prior_name!r} has no setting closure")
        prior = object.__getattribute__(self, "__dict__")[prior_name]
        value = prior.sample(key)
        if setting_closure is not None:
            setting_closure(self, value)
        else:
            self._set_constrained(param_or_closure, value)
        return self

    # -- train / eval ------------------------------------------------------------------------
    def train(self, mode: bool = True) -> "Module":
        for module in self.modules():
            object.__getattribute__(module, "__dict__")["training"] = mode
            module.clear_caches()
        return self

    def eval(self) -> "Module":
        return self.train(False)

    def clear_caches(self) -> None:
        self._cache.clear()

    # -- state dict (checkpointing; reference: torch state_dict + module.py:375-413) ---------
    def state_dict(self, prefix: str = "") -> Dict[str, np.ndarray]:
        out = {}
        for name, value in self.named_parameters():
            out[name] = np.asarray(value)
        return out

    def load_state_dict(self, state: Dict[str, Any], strict: bool = True) -> "Module":
        own = dict(self.named_parameters())
        for name, value in state.items():
            if name not in own:
                if strict:
                    raise KeyError(f"Unexpected key {name!r} in state dict")
                continue
            module, leaf = self._resolve(name)
            cur = object.__getattribute__(module, "__dict__")[leaf]
            object.__getattribute__(module, "__dict__")[leaf] = jnp.asarray(value, dtype=cur.dtype)
        if strict:
            missing = set(own) - set(state)
            if missing:
                raise KeyError(f"Missing keys in state dict: {sorted(missing)}")
        self.clear_caches()
        return self

    # -- call protocol --------------------------------------------------------------------------
    def forward(self, *args, **kwargs):
        raise NotImplementedError

    def __call__(self, *args, **kwargs):
        return self.forward(*args, **kwargs)

    def __repr__(self):
        lines = [type(self).__name__ + "("]
        for name, child in self.named_children():
            child_repr = repr(child).replace("\n", "\n  ")
            lines.append(f"  ({name}): {child_repr}")
        lines.append(")")
        return "\n".join(lines) if len(lines) > 2 else type(self).__name__ + "()"

    def deepcopy(self) -> "Module":
        return copy.deepcopy(self)


# Module subclasses DictPyTree, so it was auto-registered by __init_subclass__.
register_dynamic_base(Module)


class RandomModuleMixin:
    """Mixin allowing dotted-path initialize on plain (non-Module) containers
    (reference: gpytorch/module.py:30-68).  Our Module.initialize already resolves dotted
    names, so this simply forwards."""

    def initialize(self, **kwargs):
        return Module.initialize(self, **kwargs)
