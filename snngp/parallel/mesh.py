"""Mesh/runtime layer (SURVEY.md D1).

The reference's entire device story is env-var GPU selection
(``run.py:16-20``). Here the first-class runtime is a ``jax.sharding.Mesh``
over which Gram construction and dense factorizations shard; XLA inserts the
ICI collectives.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = ["device_count", "get_mesh", "row_sharding", "replicated"]


def device_count() -> int:
    return jax.device_count()


def get_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1D mesh over the first ``n_devices`` devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def row_sharding(mesh: Mesh, ndim: int = 2, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (row) dimension over the mesh; replicate the rest."""
    spec = PartitionSpec(axis_name, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())
