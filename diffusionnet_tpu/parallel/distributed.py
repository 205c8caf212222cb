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
    already initialized or single-process). A genuine init FAILURE with an
    explicit coordinator_address re-raises — silently proceeding would run N
    independent single-process copies that train divergently with no error."""
    # structural already-initialized check first (the exception-text match
    # below is a fallback — a JAX release rewording the message must not turn
    # a harmless double-init into a hard raise)
    state = getattr(jax.distributed, "global_state", None)
    if state is not None and getattr(state, "client", None) is not None:
        print("jax.distributed already initialized; skipping")
        return
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (RuntimeError, ValueError) as e:
        msg = str(e).lower()
        if "already" in msg and "initialize" in msg:
            print(f"jax.distributed.initialize skipped: {e}")
            return
        if coordinator_address is None and num_processes in (None, 1):
            # single-process environment probing: nothing to coordinate
            print(f"jax.distributed.initialize skipped: {e}")
            return
        raise


def make_pod_mesh(vert: int = 1) -> Mesh:
    """(data, vert) mesh over all global devices; `vert` kept within a slice.

    Devices are ordered so consecutive devices share a slice (jax.devices()
    already groups by process/slice); reshaping to (-1, vert) therefore puts
    the vert axis on ICI neighbors.
    """
    devices = np.asarray(jax.devices())
    if devices.size % vert != 0:
        raise ValueError(f"{devices.size} devices not divisible by vert={vert}")
    local = jax.local_device_count()
    if vert > 1 and local % vert != 0 and vert % local != 0:
        # a vert group would straddle a host/slice boundary, so the per-block
        # psum would ride DCN instead of ICI — refuse instead of silently
        # delivering orders-of-magnitude slower collectives
        raise ValueError(
            f"vert={vert} does not tile the {local} devices per process; "
            "vert groups would span slices (collectives over DCN)")
    return Mesh(devices.reshape(-1, vert), axis_names=("data", "vert"))
