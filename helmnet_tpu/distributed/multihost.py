"""Multi-host (multi-process) distributed runtime.

The reference scales with PyTorch-Lightning DDP over NCCL, configured purely
by `--accelerator ddp --gpus ...` (train.py:14-25); the TPU-native analog is
`jax.distributed.initialize` + a device mesh whose data axis spans hosts:
gradients all-reduce hierarchically (ICI within a host/slice, DCN across),
inserted by XLA from the sharding annotations — no explicit collectives.

Usage (one call per process, before any other jax work):

    from helmnet_tpu.distributed import multihost
    multihost.initialize(coordinator="10.0.0.1:8476",
                         num_processes=2, process_id=rank)
    mesh = make_mesh(ParallelConfig(data=8))   # data axis spans both hosts

On TPU pods all three arguments are auto-detected from the environment
(initialize() with no args). The 2-process CPU cluster used by the tests
passes them explicitly.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np


def initialize(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize wrapper (idempotent).

    NOTE: must run before anything touches the XLA backend — even
    jax.devices()/jax.process_count() would initialize it, so idempotency
    is checked against the distributed client state, not the device API.
    """
    from jax._src import distributed as _dist

    if _dist.global_state.client is not None:
        return  # already initialized
    if coordinator is None:
        jax.distributed.initialize()  # TPU pod: auto-detect
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )


def is_primary() -> bool:
    """True on the process that should write logs/checkpoints metadata."""
    return jax.process_index() == 0


def put_global(arr, sharding):
    """Place a host array onto a (possibly multi-host) sharding.

    Single-process: plain device_put. Multi-process: every process passes
    the SAME full global array (replicated host data — the training loop's
    RNG is seed-synchronized across processes), and each process fills only
    its addressable shards.
    """
    arr = np.asarray(arr)
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )


def fetch_global(arr):
    """Host copy of a global jax.Array, valid on every process.

    Fully-replicated/addressable arrays copy directly; cross-host sharded
    arrays are allgathered over DCN first (training-loop metric/write-back
    fetches)."""
    if not isinstance(arr, jax.Array):
        return np.asarray(arr)
    if arr.is_fully_addressable:
        return np.asarray(arr)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(arr, tiled=True))


def barrier(name: str = "sync") -> None:
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
