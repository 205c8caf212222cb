"""AOT serving: export the forward pass as portable StableHLO artifacts
(bucketed static vertex shapes, symbolic batch), load + serve without the
model definition. See serving.export module docstring."""

from .export import (
    PreparedMesh,
    PreparedSurface,
    ServingModel,
    ShardedServingModel,
    export_forward,
    export_sharded_forward,
    load_serving_model,
    load_sharded_serving_model,
)

__all__ = [
    "PreparedMesh",
    "PreparedSurface",
    "ServingModel",
    "ShardedServingModel",
    "export_forward",
    "export_sharded_forward",
    "load_serving_model",
    "load_sharded_serving_model",
]
