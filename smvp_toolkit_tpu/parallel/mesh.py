"""Device mesh construction + multi-host process-group initialization.

TPU-native replacement for what a CUDA framework would do with
NCCL/MPI bootstrap: ``jax.distributed.initialize()`` forms the process
group (one process per host), and a 1-D ``Mesh`` over all addressable
chips carries the data-parallel axis. ICI moves data within a slice,
DCN between hosts — both behind the same collective API.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh

__all__ = ["make_mesh", "distributed_init", "device_count"]

DP_AXIS = "dp"


def distributed_init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the multi-host process group (no-op when single-process).

    Call once per host before any device computation on a multi-host
    slice. Arguments default to the TPU metadata auto-detection built into
    ``jax.distributed.initialize``.
    """
    if jax.process_count() > 1:
        return  # already initialized
    if coordinator_address is None and num_processes is None:
        # Single-process (or auto-detected TPU env): initialize() with no
        # args is only valid on TPU pods; skip quietly elsewhere.
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def device_count() -> int:
    return len(jax.devices())


def make_mesh(
    n_devices: Optional[int] = None,
    *,
    axis_name: str = DP_AXIS,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """A 1-D mesh over ``n_devices`` chips (default: all addressable)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            if n_devices > len(devices):
                raise ValueError(
                    f"requested {n_devices} devices, only {len(devices)} present"
                )
            devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.asarray(devices), (axis_name,))
