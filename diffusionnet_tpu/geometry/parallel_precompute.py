"""Host-parallel operator precompute.

The reference precomputes operators in a serial Python loop
(geometry.py:410-422). Dataset precompute is embarrassingly parallel across
shapes and the disk cache is race-tolerant by design (duplicate writers at worst
produce an extra bucket, reference geometry.py:444-446), so fan it out over a
process pool. Cache-hit loads stay in-process (they're I/O bound and fast)."""

from __future__ import annotations

import os
from multiprocessing import get_context

import numpy as np

from .operators import Operators, get_operators


def _worker(args):
    verts, faces, k_eig, op_cache_dir, normals = args
    # Returns the Operators bundle (numpy pytree — picklable NamedTuple of
    # arrays and Ell NamedTuples).
    return get_operators(verts, faces, k_eig=k_eig, op_cache_dir=op_cache_dir,
                         normals=normals)


def get_all_operators_parallel(verts_list, faces_list, k_eig: int,
                               op_cache_dir: str | None = None,
                               normals=None,
                               n_workers: int | None = None) -> list[Operators]:
    """Parallel version of get_all_operators. Results keep input order."""
    n = len(verts_list)
    n_workers = n_workers if n_workers is not None else (os.cpu_count() or 1)
    jobs = [(np.asarray(verts_list[i]), np.asarray(faces_list[i]), k_eig,
             op_cache_dir, None if normals is None else normals[i])
            for i in range(n)]
    if n_workers <= 1 or n <= 1:
        return [_worker(j) for j in jobs]
    ctx = get_context("spawn")  # fork is unsafe with a live TPU/XLA client
    with ctx.Pool(min(n_workers, n)) as pool:
        return list(pool.map(_worker, jobs))
