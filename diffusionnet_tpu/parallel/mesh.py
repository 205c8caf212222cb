"""Device-mesh helpers.

The reference has no distributed code (single cuda:0 everywhere, SURVEY §2.6);
scaling here is new capability designed for TPU pods: a 2-D logical mesh with a
`data` axis (mesh-level data parallelism — each device trains on different
surfaces) and a `vert` axis (vertex/model sharding — one very large surface's
V-dimension split across devices, collectives over ICI).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int | None = None, vert: int = 1,
              devices=None) -> Mesh:
    """Build a (data, vert) logical mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // vert
    if data * vert != n:
        raise ValueError(f"data*vert = {data * vert} != n_devices = {n}")
    dev_array = np.asarray(devices).reshape(data, vert)
    return Mesh(dev_array, axis_names=("data", "vert"))


def data_parallel_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a batch pytree: leading (batch) axis split over `data`."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def vertex_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for per-vertex arrays of one large surface: V axis over `vert`."""
    return NamedSharding(mesh, P("vert"))
