"""Device mesh setup and multi-host initialization.

The parallelism layer the reference lacks entirely (SURVEY §2.16): the tile
grid is sharded across chips over a 1-D "tiles" mesh axis (pixel/tile data
parallelism), Gaussian parameters replicated, per-Gaussian gradients psum'd
by the shard_map transpose in tpu_splat.raster.blend. Collectives ride ICI
within a slice / DCN across hosts via jax.distributed — the XLA-native
NCCL-equivalent; no custom transport.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def device_count() -> int:
    return jax.device_count()


def make_mesh(n_devices: int | None = None, axis: str = "tiles") -> Mesh:
    """1-D mesh over all (or the first n) devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def multihost_init(coordinator: str | None = None, num_processes: int | None = None,
                   process_id: int | None = None):
    """Initialize jax.distributed for pod-slice / multi-host runs. Safe to
    call on single-host (no-op without env configuration)."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        pass  # already initialized or single-host
