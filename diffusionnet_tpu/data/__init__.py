"""Datasets and static-shape batching — the host-side data path.

The reference has no dataset abstraction beyond per-experiment
torch.utils.data.Dataset classes fed through DataLoader(batch_size=None)
(one variable-shape mesh per step, e.g. reference
classification_shrec11.py:64,75). On TPU, variable shapes force recompiles, so
this package provides the TPU-native equivalent: `SurfaceDataset` (shapes +
labels + precomputed Operators) and `make_padded_batches` (vertex-bucketed,
statically padded `PaddedBatch` pytrees with masked filler samples).
"""

from .dataset import (  # noqa: F401
    DeviceDataset,
    PaddedBatch,
    SurfaceDataset,
    make_padded_batches,
    prefetch_to_device,
)
from . import features  # noqa: F401
