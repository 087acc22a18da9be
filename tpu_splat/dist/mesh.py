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
    call on single-host (no-op without env configuration). Returns
    (process_index, process_count) after initialization."""
    if num_processes is not None and num_processes > 1:
        # explicit multi-process topology: a failure here is a
        # misconfiguration, not a single-host fallback — surface it
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
        return jax.process_index(), jax.process_count()
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        pass  # already initialized or single-host
    return jax.process_index(), jax.process_count()


def host_camera_indices(
    n_cameras: int, process_index: int, process_count: int
) -> np.ndarray:
    """Per-host camera partition for multi-host data-parallel training
    (BASELINE.json config 5, SURVEY §2.16 DCN): host p owns cameras
    p, p+P, p+2P, ... — strided so every host's subset spans the capture
    trajectory (contiguous blocks would give each host one viewing arc and
    bias its gradient contributions). Disjoint, exhaustive, balanced
    within one camera."""
    if not (0 <= process_index < process_count):
        raise ValueError(f"process {process_index} outside [0, {process_count})")
    return np.arange(process_index, n_cameras, process_count)


def host_epoch_permutation(
    n_cameras: int, epoch: int, process_index: int, process_count: int
) -> np.ndarray:
    """Deterministic per-epoch camera order for one host: all hosts derive
    the SAME global permutation from (seed=epoch) and take their strided
    slice, so the union across hosts covers every camera exactly once per
    epoch without any cross-host communication."""
    perm = np.random.default_rng(epoch).permutation(n_cameras)
    return perm[host_camera_indices(n_cameras, process_index, process_count)]
