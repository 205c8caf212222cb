"""kNN and farthest-point sampling on device — pure jnp, jittable, static shapes.

Capability parity with reference geometry.py:669-751. TPU-first differences:
  * brute-force kNN is chunked over the source axis (lax.map) so the (N,M) distance
    matrix never exceeds a fixed working-set size — this replaces the reference's
    auto-switch to a CPU KD-tree above 1e8 pairs (geometry.py:674-676). A host
    KD-tree path also exists in `native/` for CPU-side precompute.
  * FPS runs as one lax.fori_loop on device (no per-step `.item()` host sync as in
    geometry.py:741-749).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .vector import norm2
from .transforms import normalize_positions


def find_knn(points_source, points_target, k: int, largest: bool = False,
             omit_diagonal: bool = False, method: str = "brute",
             chunk_size: int = 2048):
    """k nearest neighbors of each source point among target points.

    Returns (dists, inds), sorted by increasing distance (decreasing if largest).
    omit_diagonal requires source and target to be the same set (same shape), as in
    reference geometry.py:671-672. method='brute' runs on device (chunked);
    method='cpu_kd' uses the host KD-tree (native C++ or scipy) like the
    reference's sklearn path (geometry.py:695-721).
    """
    if omit_diagonal and points_source.shape[0] != points_target.shape[0]:
        raise ValueError(
            "omit_diagonal can only be used when source and target are same shape")

    if method == "cpu_kd":
        if largest:
            raise ValueError("can't do largest with cpu_kd")
        import numpy as np
        from ..geometry.knn_host import find_knn_host
        d, i = find_knn_host(np.asarray(points_source),
                             np.asarray(points_target), k,
                             omit_diagonal=omit_diagonal)
        return jnp.asarray(d.astype(np.float32)), jnp.asarray(i)
    elif method != "brute":
        raise ValueError("unrecognized method")

    N = points_source.shape[0]
    chunk = min(chunk_size, N)
    # pad source to a multiple of chunk so lax.map sees a static grid
    n_chunks = -(-N // chunk)
    pad_n = n_chunks * chunk
    src = jnp.pad(points_source, ((0, pad_n - N), (0, 0)))
    src_ids = jnp.arange(pad_n)

    def one_chunk(args):
        pts, ids = args  # (chunk, 3), (chunk,)
        d2 = (jnp.sum(pts * pts, axis=-1)[:, None]
              - 2.0 * pts @ points_target.T
              + jnp.sum(points_target * points_target, axis=-1)[None, :])
        d2 = jnp.maximum(d2, 0.0)
        if omit_diagonal:
            tgt_ids = jnp.arange(points_target.shape[0])
            # mask the self-match to the WORST value for the selection
            # direction: +inf would be picked first by largest=True
            fill = -jnp.inf if largest else jnp.inf
            d2 = jnp.where(ids[:, None] == tgt_ids[None, :], fill, d2)
        if largest:
            vals, inds = jax.lax.top_k(d2, k)
        else:
            vals, inds = jax.lax.top_k(-d2, k)
            vals = -vals
        return jnp.sqrt(vals), inds

    dists, inds = jax.lax.map(
        one_chunk,
        (src.reshape(n_chunks, chunk, -1), src_ids.reshape(n_chunks, chunk)))
    dists = dists.reshape(pad_n, k)[:N]
    inds = inds.reshape(pad_n, k)[:N]
    return dists, inds


def farthest_point_sampling(points, n_sample: int):
    """Greedy FPS; returns a boolean (N,) mask with n_sample True entries.

    Centermost seed as in reference geometry.py:736-739; the greedy loop is a
    device-resident lax.fori_loop (geometry.py:741-749 syncs to host each step).
    """
    N = points.shape[0]
    if n_sample > N:
        raise ValueError("not enough points to sample")

    pts = normalize_positions(points)
    i0 = jnp.argmin(norm2(pts))

    chosen = jnp.zeros(N, dtype=bool).at[i0].set(True)
    min_dists = jnp.full(N, jnp.inf, dtype=points.dtype)

    def body(_, state):
        chosen, min_dists, i = state
        dists = norm2(pts[i][None, :] - pts)
        min_dists = jnp.minimum(dists, min_dists)
        # never re-pick a chosen point: with duplicate points min_dists can
        # be 0 everywhere and a bare argmax would return an already-chosen
        # index, yielding fewer than n_sample True entries
        i_next = jnp.argmax(jnp.where(chosen, -1.0, min_dists))
        return chosen.at[i_next].set(True), min_dists, i_next

    chosen, _, _ = jax.lax.fori_loop(0, n_sample - 1, body, (chosen, min_dists, i0))
    return chosen
