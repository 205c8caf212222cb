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
    verts, faces, k_eig, op_cache_dir, normals, eigensolver = args
    # Returns the Operators bundle (numpy pytree — picklable NamedTuple of
    # arrays and Ell NamedTuples).
    return get_operators(verts, faces, k_eig=k_eig, op_cache_dir=op_cache_dir,
                         normals=normals, eigensolver=eigensolver)


def get_all_operators_parallel(verts_list, faces_list, k_eig: int,
                               op_cache_dir: str | None = None,
                               normals=None,
                               n_workers: int | None = None,
                               eigensolver: str = "host") -> list[Operators]:
    """Parallel version of get_all_operators. Results keep input order.

    eigensolver defaults to 'host' here (unlike get_operators' 'device'):
    the point of the pool is CPU-parallel ARPACK across shapes, and N worker
    processes cannot share the single TPU client — a spawned worker trying
    to grab the chip a parent process already holds would deadlock/crash.
    Pass eigensolver='device' only with n_workers=1 (in-process)."""
    n = len(verts_list)
    n_workers = n_workers if n_workers is not None else (os.cpu_count() or 1)

    # cache hits load in-process (I/O-bound and fast); only MISSES go to the
    # spawn pool — routing hits through workers would pay process startup
    # plus pickling every full Operators bundle back through a pipe
    results: list = [None] * n
    miss = []
    for i in range(n):
        if op_cache_dir is not None:
            results[i] = get_operators(
                verts_list[i], faces_list[i], k_eig=k_eig,
                op_cache_dir=op_cache_dir,
                normals=None if normals is None else normals[i],
                cache_only=True)
        if results[i] is None:
            miss.append(i)

    jobs = [(np.asarray(verts_list[i]), np.asarray(faces_list[i]), k_eig,
             op_cache_dir, None if normals is None else normals[i],
             eigensolver)
            for i in miss]
    if n_workers <= 1 or len(miss) <= 1:
        computed = [_worker(j) for j in jobs]
    else:
        ctx = get_context("spawn")  # fork is unsafe with a live TPU/XLA client
        with ctx.Pool(min(n_workers, len(miss))) as pool:
            computed = list(pool.map(_worker, jobs))
    for i, ops in zip(miss, computed):
        results[i] = ops
    return results


def precompute_shard_for_host(verts_list, faces_list, k_eig: int,
                              op_cache_dir: str,
                              process_index: int | None = None,
                              process_count: int | None = None,
                              normals=None,
                              n_workers: int | None = None) -> list[int]:
    """Multi-host precompute: each host computes a round-robin slice of the
    dataset into the SHARED op_cache_dir (the cache is race-tolerant, so
    concurrent hosts are safe — worst case a duplicate bucket file). After all
    hosts finish, every host loads the full dataset at cache-hit speed with
    get_all_operators.

    process_index/count default to jax.process_index()/process_count() (the
    jax.distributed pod identity). Returns the indices this host computed.
    """
    if process_index is None or process_count is None:
        import jax
        process_index = jax.process_index()
        process_count = jax.process_count()
    mine = list(range(process_index, len(verts_list), process_count))
    if not mine:
        return mine
    sub_v = [verts_list[i] for i in mine]
    sub_f = [faces_list[i] for i in mine]
    sub_n = None if normals is None else [normals[i] for i in mine]
    get_all_operators_parallel(sub_v, sub_f, k_eig=k_eig,
                               op_cache_dir=op_cache_dir, normals=sub_n,
                               n_workers=n_workers)
    return mine
