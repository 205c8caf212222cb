"""Banded-dense SpMM — the TPU answer to gather-bound SpMV.

XLA lowers the ELL matvec's row gather poorly on TPU: measured 19.5 ms
(~46 GB/s effective, 18x under HBM peak) per (200k x 200k, 160-column)
Laplacian matvec, while a comparable dense matmul takes 0.8 ms. Mesh
Laplacians are one-ring local, so a bandwidth-reducing (reverse
Cuthill–McKee) vertex reordering makes them BANDED; the matvec then becomes
a batch of per-row-tile dense (TR, W) x (W, C) matmuls — pure MXU work fed
by contiguous window DMAs (one dynamic-slice per tile, ~300 KB granules),
no per-row gather. The Chebyshev eigensolver sweeps (geometry/eigen.py) are
the primary consumer.

Trade-off: the band stores TR x W per tile densely — memory amplification
(nnz ~ 7V vs V*W entries) bounded by `max_band_bytes`; callers fall back to
the ELL gather path when the reordered bandwidth is too large.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp


class Banded(NamedTuple):
    """A square (n, n) sparse matrix as per-row-tile dense bands, under a
    row/column permutation `perm` (apply as P A P^T):

    band:   (T, TR, W) float — tile t, local row r holds the dense window
            A[perm][t*TR + r, starts[t] : starts[t] + W]
    starts: (T,) int32 window starts (clamped so starts[t] + W <= n_pad)
    n:      logical dimension V (rows t*TR + r >= n are zero padding)
    perm:   (n,) int64 — new-order -> old-index mapping (numpy, host-side)
    """
    band: jnp.ndarray
    starts: jnp.ndarray
    n: int
    perm: np.ndarray

    @property
    def width(self) -> int:
        return self.band.shape[-1]

    @property
    def tile_rows(self) -> int:
        return self.band.shape[-2]


def rcm_permutation(mat) -> np.ndarray:
    """Reverse Cuthill–McKee ordering (symmetric) — new -> old indices."""
    import scipy.sparse
    from scipy.sparse.csgraph import reverse_cuthill_mckee
    return np.asarray(reverse_cuthill_mckee(
        scipy.sparse.csr_matrix(mat), symmetric_mode=True), dtype=np.int64)


def _band_plan(mat, tile_rows: int, max_band_bytes: int,
               perm: np.ndarray | None, dtype):
    """Host-side band layout plan: permutation, per-tile window starts, and
    the flat scatter targets of every nonzero. Returns None when the
    reordered bandwidth would exceed max_band_bytes."""
    import scipy.sparse
    csr = scipy.sparse.csr_matrix(mat)
    V = csr.shape[0]
    if perm is None:
        perm = rcm_permutation(csr)
    p = scipy.sparse.csr_matrix(csr[perm][:, perm])

    T = -(-V // tile_rows)
    n_pad = T * tile_rows
    indptr, indices, data = p.indptr, p.indices, p.data

    # per-tile window: [min col, max col] over the tile's rows
    starts = np.zeros(T, np.int64)
    width = 0
    for t in range(T):
        r0, r1 = t * tile_rows, min((t + 1) * tile_rows, V)
        cols = indices[indptr[r0]:indptr[r1]]
        lo = int(cols.min()) if cols.size else 0
        hi = int(cols.max()) if cols.size else 0
        starts[t] = lo
        width = max(width, hi - lo + 1)
    W = -128 * (-width // 128)                   # lane-align the window
    if T * tile_rows * W * np.dtype(dtype).itemsize > max_band_bytes:
        return None
    # clamp so every window fits inside the padded x (callers pad x to n_pad
    # + nothing: windows index [start, start + W) within [0, n_pad))
    starts = np.minimum(starts, max(n_pad - W, 0))

    rows = np.repeat(np.arange(V), np.diff(indptr))
    t_of = rows // tile_rows
    local_r = rows % tile_rows
    local_c = indices - starts[t_of]
    assert (local_c >= 0).all() and (local_c < W).all()
    flat = (t_of * tile_rows + local_r) * W + local_c
    return perm, starts, T, W, flat, data.astype(dtype)


def banded_from_sparse(mat, tile_rows: int = 512,
                       max_band_bytes: int = 2_500_000_000,
                       perm: np.ndarray | None = None,
                       dtype=np.float32) -> Banded | None:
    """Build the banded representation of a scipy sparse matrix under an RCM
    permutation (host-side numpy band — the test oracle). Returns None when
    the reordered bandwidth would exceed max_band_bytes — callers fall back
    to the gather path."""
    plan = _band_plan(mat, tile_rows, max_band_bytes, perm, dtype)
    if plan is None:
        return None
    perm, starts, T, W, flat, vals = plan
    band = np.zeros(T * tile_rows * W, dtype)
    band[flat] = vals
    return Banded(band=band.reshape(T, tile_rows, W),
                  starts=starts.astype(np.int32), n=mat.shape[0], perm=perm)


def banded_from_sparse_device(mat, tile_rows: int = 512,
                              max_band_bytes: int = 2_500_000_000,
                              perm: np.ndarray | None = None,
                              dtype=np.float32) -> Banded | None:
    """banded_from_sparse with the dense band assembled ON DEVICE by a
    ~nnz-sized scatter. The band stores ~TR*W/avg_degree x more zeros than
    the sparse matrix (a 1.13 GB band for 14 MB of ELL data at 200k); both
    materializing it in host memory and shipping it over the host->device
    link are pure waste — measured through this environment's device tunnel
    the upload alone dominated the whole 200k eigensolve. Uploading the flat
    scatter targets + values (2 x nnz x 4 bytes) and scattering on device is
    bounded by nnz instead of the dense band size."""
    plan = _band_plan(mat, tile_rows, max_band_bytes, perm, dtype)
    if plan is None:
        return None
    perm, starts, T, W, flat, vals = plan
    band = (jnp.zeros(T * tile_rows * W, dtype)
            .at[jnp.asarray(flat, jnp.int32)]
            .set(jnp.asarray(vals), unique_indices=True)
            .reshape(T, tile_rows, W))
    return Banded(band=band, starts=jnp.asarray(starts, jnp.int32),
                  n=mat.shape[0], perm=perm)


def banded_matvec(b: Banded, x):
    """y = (P A P^T) @ x for x already in the permuted order. x: (n_pad, C)
    where n_pad = T * TR (callers pad; padded rows must be zero).
    Returns (n_pad, C)."""
    T, TR, W = b.band.shape
    C = x.shape[-1]

    def window(s):
        return jax.lax.dynamic_slice(x, (s, jnp.zeros((), jnp.int32)), (W, C))

    xw = jax.vmap(window)(b.starts)                      # (T, W, C)
    y = jnp.einsum("trw,twc->trc", b.band, xw,
                   preferred_element_type=jnp.float32)
    return y.reshape(T * TR, C)


# ---------------------------------------------------------------------------
# DIA (diagonal) format — the gather-free special case for STRUCTURED meshes.
# A grid-structured triangulation's Laplacian has a handful of distinct
# (col - row) offsets (flat_grid: exactly 7 at any size); its matvec is then
# a sum of statically-shifted elementwise products — no gather, no dense
# window, memory exactly D*V. At 1M x 160 columns this is the only
# single-chip fast path: the RCM band needs W ~ 2*bandwidth ~ 2560 lanes
# (10 GB, over budget) while ELL's row gather measures ~1.5 s per matvec.
# ---------------------------------------------------------------------------


def dia_from_sparse(mat, max_diags: int = 48, dtype=np.float32):
    """Row-wise DIA extraction: data[d, i] = A[i, i + offsets[d]].
    Returns (data (D, V) numpy, offsets tuple[int]) or None when the matrix
    has more than max_diags distinct diagonals (unstructured mesh)."""
    coo = mat.tocoo()
    off = coo.col - coo.row
    offsets = np.unique(off)
    if offsets.size > max_diags:
        return None
    V = mat.shape[0]
    data = np.zeros((offsets.size, V), dtype)
    d_idx = np.searchsorted(offsets, off)
    np.add.at(data, (d_idx, coo.row), coo.data.astype(dtype))
    return data, tuple(int(o) for o in offsets)


def dia_matvec(data, offsets: tuple, x):
    """y = A @ x, row-wise DIA: y[i] = sum_d data[d, i] * x[i + offsets[d]].

    offsets are STATIC Python ints, so every term below is a static slice of
    ONE zero-padded buffer — a multiply-add chain XLA fuses into a single
    elementwise kernel (reads of xp at small relative offsets hit the same
    tiles). The earlier formulation (`y.at[:V-off].add(...)`) lowered each
    offset to a dynamic-update-slice that rewrote the full (V, C) accumulator
    per diagonal — measured ~0.9 s/matvec at 1M x 160 on v5e vs ~10 ms here.

    Correctness of the halo reads: dia_from_sparse only writes data[d, i]
    for entries A[i, i+off] that exist, so rows whose i+off falls outside
    [0, V) carry data == 0 and the out-of-range (zero-padded) x values they
    read are multiplied away. x: (V, C)."""
    V = x.shape[0]
    P = max(abs(o) for o in offsets)
    if P == 0:
        return data[0][:, None] * x
    xp = jnp.pad(x, ((P, P), (0, 0)))
    y = None
    for d, off in enumerate(offsets):
        t = data[d][:, None] * jax.lax.slice_in_dim(xp, P + off, P + off + V,
                                                    axis=0)
        y = t if y is None else y + t
    return y
