"""Host kNN for the precompute pipeline.

Uses the in-repo native C++ KD-tree when built (native/), else scipy's cKDTree.
Mirrors reference find_knn(method='cpu_kd') semantics (geometry.py:695-721)
including the duplicate-point guard in omit_diagonal."""

from __future__ import annotations

import numpy as np


def find_knn_host(points_source: np.ndarray, points_target: np.ndarray, k: int,
                  omit_diagonal: bool = False):
    """Returns (dists, inds) each (N, k), sorted by increasing distance."""
    points_source = np.asarray(points_source, dtype=np.float64)
    points_target = np.asarray(points_target, dtype=np.float64)
    if omit_diagonal and points_source.shape[0] != points_target.shape[0]:
        raise ValueError("omit_diagonal requires same source/target shape")

    # clamp to the target count: scipy fills missing neighbors with the
    # out-of-range sentinel index V (and dist inf), which would leak into
    # downstream gathers on tiny clouds (V <= k)
    V = points_target.shape[0]
    k_max = V - 1 if omit_diagonal else V
    if k > k_max:
        import warnings
        warnings.warn(
            f"find_knn_host: k={k} exceeds the {k_max} available target "
            f"points; returning (N, {k_max}) arrays instead of (N, {k})",
            stacklevel=2)
        k = k_max
    if k < 1:
        raise ValueError(f"need at least {'2' if omit_diagonal else '1'} "
                         f"target points, got {V}")
    k_search = k + 1 if omit_diagonal else k

    try:
        from ..native import knn_native
        dists, neighbors = knn_native(points_target, points_source, k_search)
    except Exception:
        from scipy.spatial import cKDTree
        tree = cKDTree(points_target)
        dists, neighbors = tree.query(points_source, k=k_search)
        if k_search == 1:
            dists, neighbors = dists[:, None], neighbors[:, None]

    if omit_diagonal:
        # Mask out the self element; if duplicates mean self never appears,
        # drop the farthest instead (reference geometry.py:709-716).
        mask = neighbors != np.arange(neighbors.shape[0])[:, None]
        mask[np.sum(mask, axis=1) == mask.shape[1], -1] = False
        neighbors = neighbors[mask].reshape(neighbors.shape[0],
                                            neighbors.shape[1] - 1)
        dists = dists[mask].reshape(dists.shape[0], dists.shape[1] - 1)

    return dists, neighbors
