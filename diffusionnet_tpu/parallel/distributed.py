"""Multi-host / multi-slice initialization.

The reference is strictly single-GPU (SURVEY §2.6). For TPU pods:
`initialize()` wires up jax.distributed (one process per host), and
`make_pod_mesh` builds a (data, vert) mesh over all global devices, laying the
`vert` (model/vertex-sharding) axis within a slice so its collectives ride ICI
while the `data` axis spans slices over DCN — the standard
fast-axis-inner/slow-axis-outer layout.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize jax.distributed from args or the TPU environment (no-op if
    already initialized or single-process)."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (RuntimeError, ValueError) as e:  # already initialized / 1-process
        print(f"jax.distributed.initialize skipped: {e}")


def make_pod_mesh(vert: int = 1) -> Mesh:
    """(data, vert) mesh over all global devices; `vert` kept within a slice.

    Devices are ordered so consecutive devices share a slice (jax.devices()
    already groups by process/slice); reshaping to (-1, vert) therefore puts
    the vert axis on ICI neighbors.
    """
    devices = np.asarray(jax.devices())
    if devices.size % vert != 0:
        raise ValueError(f"{devices.size} devices not divisible by vert={vert}")
    return Mesh(devices.reshape(-1, vert), axis_names=("data", "vert"))
