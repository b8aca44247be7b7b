"""Device-mesh helpers.

Axes convention (SURVEY.md section 2.3):
  data — data parallelism over the replay/eval batch (the reference's DDP)
  y, x — spatial domain decomposition of the grid's H and W axes (the
         reference has no analog; this is the long-context/CP replacement).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .config import ParallelConfig


def make_mesh(parallel: Optional[ParallelConfig] = None, devices=None) -> Mesh:
    parallel = parallel or ParallelConfig()
    devices = devices if devices is not None else jax.devices()
    n = parallel.num_devices
    if n > len(devices):
        raise ValueError(
            f"mesh needs {n} devices, only {len(devices)} available"
        )
    devs = np.asarray(devices[:n]).reshape(parallel.data, parallel.y, parallel.x)
    return Mesh(devs, axis_names=("data", "y", "x"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-axis sharding for [B, ...] arrays."""
    return NamedSharding(mesh, P("data"))


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """[B, H, W, C] arrays: batch over data, H over y, W over x."""
    return NamedSharding(mesh, P("data", "y", "x", None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Optional[Mesh], tree):
    """Place a pytree of [B, ...] arrays with the batch axis sharded."""
    if mesh is None:
        return tree
    s = data_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, s), tree)
