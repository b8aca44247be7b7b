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
    """Build the (data, y, x) device mesh.

    Multi-process (after jax.distributed.initialize): the data axis is laid
    out hierarchically so its major dimension strides across processes (DCN)
    and its minor dimension stays within each process's local devices (ICI)
    — gradient all-reduces become hierarchical reduce-scatter/all-gather
    without any change to the (data, y, x) partition specs used everywhere.
    """
    parallel = parallel or ParallelConfig()
    if devices is None and jax.process_count() > 1:
        from jax.experimental import mesh_utils

        nproc = jax.process_count()
        if parallel.data % nproc:
            raise ValueError(
                f"data axis ({parallel.data}) must be divisible by the "
                f"process count ({nproc})"
            )
        # granule = slice on real multi-slice TPU topologies (devices carry
        # slice_index), = process otherwise (CPU clusters, single-slice pods)
        multi_slice = len({getattr(d, "slice_index", 0)
                           for d in jax.devices()}) == nproc
        devs = mesh_utils.create_hybrid_device_mesh(
            (parallel.data // nproc, parallel.y, parallel.x),
            (nproc, 1, 1),
            process_is_granule=not multi_slice,
        )
        return Mesh(devs, axis_names=("data", "y", "x"))
    devices = devices if devices is not None else jax.devices()
    n = parallel.num_devices
    if n > len(devices):
        raise ValueError(
            f"mesh needs {n} devices, only {len(devices)} available"
        )
    devs = np.asarray(devices[:n]).reshape(parallel.data, parallel.y, parallel.x)
    return Mesh(devs, axis_names=("data", "y", "x"))


def make_mesh3d(data: int = 1, z: int = 1, devices=None) -> Mesh:
    """(data, z) mesh for 3D z-slab decomposition (distributed/slab3d.py).

    3D keeps H and W local (one chip holds full slabs comfortably; the
    per-axis matmul operator then needs exactly one reduce-scatter per
    application) — so the 3D mesh is 2D: batch x depth-slabs."""
    devices = devices if devices is not None else jax.devices()
    if data * z > len(devices):
        raise ValueError(
            f"mesh needs {data * z} devices, only {len(devices)} available"
        )
    devs = np.asarray(devices[: data * z]).reshape(data, z)
    return Mesh(devs, axis_names=("data", "z"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-axis sharding for [B, ...] arrays."""
    return NamedSharding(mesh, P("data"))


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """[B, H, W, C] arrays: batch over data, H over y, W over x."""
    return NamedSharding(mesh, P("data", "y", "x", None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Optional[Mesh], tree):
    """Place a pytree of [B, ...] arrays with the batch axis sharded.

    Multi-process safe: every process passes the full (replicated host)
    batch; only the addressable shards are materialized locally."""
    if mesh is None:
        return tree
    from ..distributed.multihost import put_global

    s = data_sharding(mesh)
    return jax.tree.map(lambda a: put_global(a, s), tree)
