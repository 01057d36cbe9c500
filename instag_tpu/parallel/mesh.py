"""Mesh construction and sharding helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]), (axis,))


def replicate(tree, mesh: Mesh):
    """Replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_leading_axis(tree, mesh: Mesh, axis: str = "dp"):
    """Shard every leaf's leading axis across the mesh axis."""
    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P(axis)))
    return jax.tree.map(put, tree)
