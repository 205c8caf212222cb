"""Multi-chip parallelism: device meshes, data-parallel training (shard_map),
vertex-sharded inference for very large meshes."""

from .mesh import make_mesh, data_parallel_sharding  # noqa: F401
from .data_parallel import make_dp_train_step  # noqa: F401
from .vertex_sharded import (vertex_sharded_forward,  # noqa: F401
                             vertex_sharded_megakernel_forward)
from .distributed import initialize, make_pod_mesh  # noqa: F401
