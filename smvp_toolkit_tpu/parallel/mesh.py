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


_DIST_INITIALIZED = False


def distributed_init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the multi-host process group; returns True on success.

    Must run before anything touches the XLA backend (so no
    ``jax.devices()``/``jax.process_count()`` guards here — they would
    themselves initialize the backend and make ``initialize()`` raise).
    With no arguments, ``jax.distributed.initialize`` auto-detects the
    coordinator from TPU pod metadata; in a plain single-process
    environment that detection fails and we quietly stay single-process.
    """
    global _DIST_INITIALIZED
    if _DIST_INITIALIZED:
        return True
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        _DIST_INITIALIZED = True
        return True
    except (RuntimeError, ValueError):
        # Not a pod / backend already up / no coordinator to find:
        # single-process operation.
        return False


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
