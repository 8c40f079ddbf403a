"""Functional parameter substrate (replaces objax Module/TrainVar/VarCollection).

Parameters live in plain nested dict pytrees of *unconstrained* arrays; models
are static config objects exposing ``init_params()`` and pure functions of
``params``. A constrained parameter (reference ``ConstraintTrainVar``,
``spax/base.py:15-28``) stores ``bijector.inverse(value)`` and is read back
through the bijector (``safe_value`` semantics).

Checkpoint interop: ``named_leaves`` flattens a params dict to dotted names
("kernel.w_std", ...) whose *last* component matches the reference's
name-suffix restore convention (``experiments/regression/test.py:38-43``);
see :mod:`snngp.utils.checkpoint`.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from snngp.models.bijectors import Bijector

__all__ = [
    "constrained_init",
    "constrained_read",
    "named_leaves",
    "unflatten_named",
    "get_by_suffix",
    "assign_by_suffix",
]


def constrained_init(value, bijector: Bijector) -> jax.Array:
    """Store a positive-constrained parameter as its unconstrained preimage."""
    return bijector.inverse(jnp.asarray(value, dtype=jnp.float32))


def constrained_read(raw: jax.Array, bijector: Bijector) -> jax.Array:
    """The reference's ``safe_value``: read through the bijector."""
    return bijector(raw)


def _walk(tree: Any, prefix: str, out: List[Tuple[str, jax.Array]]):
    if isinstance(tree, dict):
        for k in sorted(tree.keys()):
            _walk(tree[k], f"{prefix}.{k}" if prefix else k, out)
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            _walk(v, f"{prefix}.{i}" if prefix else str(i), out)
    else:
        out.append((prefix, tree))


def named_leaves(params: Any) -> List[Tuple[str, jax.Array]]:
    """Deterministic (name, leaf) pairs with dotted paths."""
    out: List[Tuple[str, jax.Array]] = []
    _walk(params, "", out)
    return out


def unflatten_named(named: Dict[str, Any]) -> Dict[str, Any]:
    """Rebuild a nested dict from dotted names (inverse of named_leaves for
    dict-only trees)."""
    root: Dict[str, Any] = {}
    for name, value in named.items():
        parts = name.split(".")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return root


def get_by_suffix(named: Dict[str, Any], key: str) -> Optional[Any]:
    """Reference restore convention: match a stored name by its last dotted
    component (``regression/test.py:38-43``)."""
    for name, value in named.items():
        if name.split(".")[-1] == key:
            return value
    return None


def assign_by_suffix(params: Dict[str, Any], key: str, value) -> bool:
    """Assign into a nested params dict at every leaf whose name ends in key."""
    hit = False
    if isinstance(params, dict):
        for k in list(params.keys()):
            if isinstance(params[k], dict):
                hit |= assign_by_suffix(params[k], key, value)
            elif k == key:
                params[k] = jnp.asarray(value)
                hit = True
    return hit
