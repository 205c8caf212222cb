"""Blocked-ELL SpMM — the unstructured-mesh fast path at large V.

The eigensolver's three operator formats each fail somewhere at 1M vertices
on one 16 GB chip:

  * ELL row-gather: structure-agnostic but XLA lowers the (V, D) row gather
    to descriptor-bound DMAs — measured ~1.5 s per (1M, 160) matvec;
  * dense RCM band (ops/banded.py): pure MXU, but an irregular 1M mesh's
    RCM bandwidth is ~2600 (measured: random-sphere Delaunay, bw 2615,
    per-512-row-tile window 5760) — the dense band is 22 GB, impossible;
  * DIA: refuses unstructured sparsity outright (5231 distinct diagonals
    on the same mesh vs the 48 cap).

Blocked-ELL keeps the band's MXU-feeding window locality but stores only
the OCCUPIED 128-column panels. Under the RCM permutation, rows are cut
into groups of G (default 32); each group's nonzero columns are covered by
at most NB panels of 128 columns (8-aligned starts). Measured on the 1M
Delaunay sphere: 99% of 32-row groups need <= 7 panels (mean 4.1), so
NB = 8 with a tiny COO overflow for outlier groups stores the operator in
V * NB * 128 * 4 B = 4.1 GB — 5x under the dense band — while the matvec
stays a batch of (G, 128) x (128, C) MXU matmuls.

The Pallas kernel (TPU): grid (tiles, column-chunks). Each 512-row tile
DMAs one x window (W, 128) HBM->VMEM (W = max per-tile column span, ~5.9k
at 1M: 3 MB — fits VMEM; windows of consecutive tiles overlap ~11x, so the
window re-read traffic is ~T*W*C*4 ~= 12 GB/matvec at (1M, 256) — ~15 ms at
HBM speed-of-light vs the gather's 1.5 s), then every (group, panel) runs
one MXU matmul reading the panel's x block from VMEM at its dynamic offset.

Reference parity: replaces nothing in the reference (it calls ARPACK on
host, scipy/geometry.py:349 is sparsity-agnostic); this is the TPU-native
equivalent capability for eigensolve_device on meshes DIA/banded refuse.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp


class BlockedEll(NamedTuple):
    """A square sparse matrix as per-row-group dense 128-column panels,
    under a row/column permutation `perm` (apply as P A P^T):

    blocks: (T, GROUPS, NB, G, 128) float32 — tile t, group g, panel b
            holds dense A[perm][t*TR + g*G + r, w0 + offs[t,g,b] + c] where
            w0 = starts[t].
    offs:   (T, GROUPS, NB) int32 — panel starts RELATIVE to the tile's
            window start; 8-aligned; offs + 128 <= W always.
    starts: (T,) int32 — per-tile window starts into the padded x
            (8-aligned; starts + W <= n_pad_x).
    ov_rows/ov_cols/ov_vals: (R,) COO spill for groups needing more than NB
            panels (R >= 1; padded with zero-valued entries at index 0).
    n:      logical dimension V (rows >= n are zero padding).
    n_pad_x: padded x row count the kernel expects (= T*TR + W slack).
    w_window: static window width W (multiple of 128).
    perm:   (n,) int64 new-order -> old-index mapping (host-side), or None
            when the caller already permuted.
    """
    blocks: jnp.ndarray
    offs: jnp.ndarray
    starts: jnp.ndarray
    ov_rows: jnp.ndarray
    ov_cols: jnp.ndarray
    ov_vals: jnp.ndarray
    n: int
    n_pad_x: int
    w_window: int
    perm: np.ndarray | None

    @property
    def tile_rows(self) -> int:
        return self.blocks.shape[1] * self.blocks.shape[3]

    @property
    def group_rows(self) -> int:
        return self.blocks.shape[3]

    @property
    def n_pad(self) -> int:
        return self.blocks.shape[0] * self.tile_rows


_VMEM_BUDGET = 13_500_000  # leave headroom under the ~16 MB/core VMEM


def _window_plan(csr, TR: int):
    """Per-TR-row-tile window starts (8-aligned) + the static width W
    (multiple of 128, one extra panel of slack so every chosen panel fits:
    off + 128 <= W)."""
    V = csr.shape[0]
    nnz = csr.nnz
    T = -(-V // TR)
    indices = csr.indices
    rows = np.repeat(np.arange(V, dtype=np.int64), np.diff(csr.indptr))
    starts = np.zeros(T, np.int64)
    width = 1
    if nnz:
        tile_of = rows // TR
        seg = np.searchsorted(tile_of, np.arange(T))
        nonempty = np.zeros(T, bool)
        nonempty[tile_of] = True
        red = np.minimum(seg, nnz - 1)
        lo = np.where(nonempty, np.minimum.reduceat(indices, red), 0)
        hi = np.where(nonempty, np.maximum.reduceat(indices, red), 0)
        starts = (lo // 8 * 8).astype(np.int64)
        width = int(np.maximum(hi - starts + 1, 1).max())
    W = -128 * (-width // 128) + 128
    return starts, W, rows


def _window_width(csr, TR: int) -> int:
    return _window_plan(csr, TR)[1]


def _kernel_vmem_bytes(TR: int, nb: int, W: int) -> int:
    """Kernel VMEM estimate: double-buffered panel blocks + double-buffered
    x window + double-buffered out tile (all f32, 128 lanes)."""
    return (2 * TR * nb * 128 + 2 * W * 128 + 2 * TR * 128) * 4


def blocked_ell_from_sparse(mat, group_rows: int | None = None,
                            tile_rows: int | None = None,
                            nb: int = 8,
                            max_bytes: int = 6_000_000_000,
                            perm: np.ndarray | None = None,
                            device: bool = True) -> BlockedEll | None:
    """Build the blocked-ELL representation of a scipy sparse square matrix
    under an RCM permutation. Returns None when V*nb*128*4 exceeds
    max_bytes (callers fall back to the ELL gather path).

    tile_rows/group_rows default to auto: the largest tile whose kernel
    VMEM footprint (panel blocks + x window + out, double-buffered) fits the
    ~16 MB/core budget — fewer, bigger grid iterations amortize the per-tile
    fixed cost (measured at 164k x 256: TR=1024/G=64 5.3 ms vs TR=512/G=32
    6.5 ms; TR=2048 exceeds VMEM and fails to compile).

    device=True assembles the dense panel array ON DEVICE by an nnz-sized
    scatter (the panels store ~NB*128/degree x more zeros than the sparse
    matrix; shipping them over the host->device link would dominate — same
    argument as banded_from_sparse_device, ops/banded.py:120)."""
    import scipy.sparse

    csr = scipy.sparse.csr_matrix(mat)
    V = csr.shape[0]
    if perm is None:
        from .banded import rcm_permutation
        perm = rcm_permutation(csr)
    p = scipy.sparse.csr_matrix(csr[perm][:, perm])
    p.sort_indices()

    if tile_rows is None:
        tile_rows = 1024
        w_probe = _window_width(p, tile_rows)
        if _kernel_vmem_bytes(tile_rows, nb, w_probe) > _VMEM_BUDGET:
            tile_rows = 512
    if group_rows is None:
        group_rows = max(32, tile_rows // 16)

    TR, G = tile_rows, group_rows
    assert TR % G == 0
    T = -(-V // TR)
    n_pad = T * TR
    GROUPS = TR // G
    if n_pad * nb * 128 * 4 > max_bytes:
        return None

    indptr, indices, data = p.indptr, p.indices, p.data
    nnz = p.nnz
    starts, W, rows = _window_plan(p, TR)
    n_pad_x = n_pad + W  # windows may read past n_pad; rows there are zero

    # Per-group panel selection, fully vectorized as <= nb passes of
    # segmented mins over (group, col)-sorted entries: each pass opens one
    # 8-aligned 128-wide panel per group at its lowest still-uncovered
    # column (greedy left-to-right interval cover — optimal for a fixed
    # panel count); entries left after nb passes spill to the COO overflow.
    # Panels thus emerge in ascending column order and the pass index IS
    # the panel slot.
    nG = -(-V // G)
    grp = rows // G
    order = np.lexsort((indices, grp))
    g_s, c_s = grp[order], indices[order].astype(np.int64)
    panel_of = np.full(nnz, -1, np.int64)     # pass index (= panel slot)
    panel_start = np.zeros(nnz, np.int64)     # chosen panel's absolute col
    offs_abs = np.zeros((nG, nb), np.int64)
    active = np.ones(nnz, bool)
    for p_i in range(nb):
        idx_a = np.nonzero(active)[0]
        if idx_a.size == 0:
            break
        ga, ca = g_s[idx_a], c_s[idx_a]
        ug, ui = np.unique(ga, return_index=True)
        pstart = ca[ui] // 8 * 8              # min active col per group
        offs_abs[ug, p_i] = pstart
        per_entry = pstart[np.searchsorted(ug, ga)]
        covered = ca < per_entry + 128
        hit = idx_a[covered]
        panel_of[hit] = p_i
        panel_start[hit] = per_entry[covered]
        active[hit] = False

    # offsets relative to the owning tile's window start (both 8-aligned)
    tile_of_group = (np.arange(nG) * G) // TR
    rel = offs_abs - starts[tile_of_group][:, None]
    # unused slots keep offs_abs 0 -> rel may go negative; they multiply
    # zero blocks, so clamp them into the window instead of asserting
    used = np.zeros((nG, nb), bool)
    used[g_s[panel_of >= 0], panel_of[panel_of >= 0]] = True
    assert ((rel[used] >= 0) & (rel[used] + 128 <= W)).all(), (W,)
    rel = np.clip(rel, 0, W - 128)
    offs = np.zeros((T, GROUPS, nb), np.int64)
    offs.reshape(-1, nb)[:nG] = rel

    # flat scatter targets into blocks (T, GROUPS, NB, G, 128)
    cov = panel_of >= 0
    rows_s = rows[order]
    t_s = rows_s // TR
    g_loc = (rows_s % TR) // G
    r_loc = rows_s % G
    flat_keep = (((((t_s[cov] * GROUPS) + g_loc[cov]) * nb + panel_of[cov])
                  * G + r_loc[cov]) * 128 + (c_s[cov] - panel_start[cov]))
    vals_keep = data[order][cov].astype(np.float32)

    if bool((~cov).any()):
        ov_rows = rows_s[~cov].astype(np.int32)
        ov_cols = c_s[~cov].astype(np.int32)
        ov_vals = data[order][~cov].astype(np.float32)
    else:  # static-shape placeholder: one zero-valued entry
        ov_rows = np.zeros(1, np.int32)
        ov_cols = np.zeros(1, np.int32)
        ov_vals = np.zeros(1, np.float32)

    shape = (T, GROUPS, nb, G, 128)
    if device:
        blocks = (jnp.zeros(int(np.prod(shape)), jnp.float32)
                  .at[jnp.asarray(flat_keep, jnp.int32)]
                  .set(jnp.asarray(vals_keep), unique_indices=True)
                  .reshape(shape))
        offs_j = jnp.asarray(offs, jnp.int32)
        starts_j = jnp.asarray(starts, jnp.int32)
        ovr, ovc, ovv = (jnp.asarray(ov_rows), jnp.asarray(ov_cols),
                         jnp.asarray(ov_vals))
    else:
        blocks = np.zeros(int(np.prod(shape)), np.float32)
        blocks[flat_keep] = vals_keep
        blocks = blocks.reshape(shape)
        offs_j, starts_j = offs.astype(np.int32), starts.astype(np.int32)
        ovr, ovc, ovv = ov_rows, ov_cols, ov_vals
    return BlockedEll(blocks=blocks, offs=offs_j, starts=starts_j,
                      ov_rows=ovr, ov_cols=ovc, ov_vals=ovv,
                      n=V, n_pad_x=int(n_pad_x), w_window=int(W), perm=perm)


@functools.lru_cache(maxsize=None)
def _blocked_kernel(T: int, GROUPS: int, NB: int, G: int, W: int,
                    n_pad_x: int, CB: int, interpret: bool):
    """Compiled Pallas SpMM for one (shape, window) configuration.

    Grid (T, CB), c fastest: the blocks/offs/starts BlockSpecs are constant
    in c so Pallas skips their re-fetch between column chunks; the x window
    DMA re-runs per chunk because it selects a different 128-lane slab."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TR = GROUPS * G

    # 1D grid i = t * CB + c (column chunk fastest: the blocks BlockSpec is
    # constant across a tile's chunks, so Pallas skips its re-fetch). The x
    # window DMA is double-buffered by hand: iteration i starts the window
    # copy for i+1, then waits on its own — the ~10 us HBM round-trip hides
    # under the group matmuls instead of serializing with them.
    def kernel(starts_ref, offs_ref, blocks_ref, x_hbm, out_ref, xw2, sem2):
        i = pl.program_id(0)
        n = pl.num_programs(0)
        t = i // CB

        def window_dma(j, slot):
            s = pl.multiple_of(starts_ref[j // CB], 8)  # builder 8-aligns
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(s, W), pl.ds((j % CB) * 128, 128)],
                xw2.at[slot], sem2.at[slot])

        @pl.when(i == 0)
        def _():
            window_dma(0, 0).start()

        @pl.when(i + 1 < n)
        def _():
            window_dma(i + 1, (i + 1) % 2).start()

        window_dma(i, i % 2).wait()
        xw = xw2.at[i % 2]

        def group(g, carry):
            acc = jnp.zeros((G, 128), jnp.float32)
            for b in range(NB):
                off = pl.multiple_of(offs_ref[t, g * NB + b], 8)
                xblk = xw[pl.ds(off, 128), :]
                acc = acc + jax.lax.dot_general(
                    blocks_ref[0, g, b], xblk,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
            out_ref[pl.ds(g * G, G), :] = acc
            return carry

        jax.lax.fori_loop(0, GROUPS, group, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # starts (T,), offs (T, GROUPS*NB): SMEM
        grid=(T * CB,),
        in_specs=[
            pl.BlockSpec((1, GROUPS, NB, G, 128),
                         lambda i, *_: (i // CB, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),   # x stays in HBM
        ],
        out_specs=pl.BlockSpec((TR, 128), lambda i, *_: (i // CB, i % CB),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, W, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T * TR, CB * 128), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * GROUPS * NB * G * 128 * CB * 128,
            bytes_accessed=(T * GROUPS * NB * G * 128 * 4
                            + T * W * CB * 128 * 4 + T * TR * CB * 128 * 4),
            transcendentals=0),
        interpret=interpret,
    )


def blocked_ell_matvec(b: BlockedEll, x, interpret: bool | None = None):
    """y = (P A P^T) @ x for x already in the permuted order.
    x: (n_pad, C) (n_pad = T*TR; padded rows must be zero). Returns
    (n_pad, C). C is padded to a multiple of 128 internally.

    interpret=None (default) auto-routes: the Pallas kernel on accelerators,
    the pure-jnp oracle on CPU (same math, XLA-compiled — much faster than
    the Pallas interpreter). interpret=True forces the interpreter (kernel
    parity tests)."""
    if interpret is None:
        if jax.default_backend() == "cpu":
            return blocked_ell_matvec_ref(b, x)
        interpret = False
    T, GROUPS, NB, G, _ = b.blocks.shape
    n_pad = T * GROUPS * G
    C = x.shape[-1]
    CB = -(-C // 128)
    n_pad_x, W = int(b.n_pad_x), int(b.w_window)
    xp = jnp.pad(x, ((0, n_pad_x - n_pad), (0, CB * 128 - C)))
    call = _blocked_kernel(T, GROUPS, NB, G, W, n_pad_x, CB, interpret)
    y = call(b.starts, b.offs.reshape(T, GROUPS * NB), b.blocks, xp)[:, :C]
    # COO overflow for groups that spilled past NB panels (R is tiny: <1%
    # of groups on the measured 1M Delaunay sphere; placeholder adds 0)
    y = y.at[b.ov_rows].add(b.ov_vals[:, None] * x[b.ov_cols, :])
    return y


def blocked_ell_matvec_ref(b: BlockedEll, x):
    """Pure-jnp oracle of blocked_ell_matvec (runs on any backend; used on
    CPU and by tests). Same math: per-tile window dynamic-slice + per-group
    panel matmuls + COO overflow."""
    T, GROUPS, NB, G, _ = b.blocks.shape
    n_pad = T * GROUPS * G
    C = x.shape[-1]
    W = b.w_window
    xp = jnp.pad(x, ((0, b.n_pad_x - n_pad), (0, 0)))

    def tile(start, offs_t, blocks_t):
        xw = jax.lax.dynamic_slice(
            xp, (start, jnp.zeros((), jnp.int32)), (W, C))   # (W, C)

        def group(offs_g, blocks_g):
            xb = jax.vmap(lambda o: jax.lax.dynamic_slice(
                xw, (o, jnp.zeros((), jnp.int32)), (128, C)))(offs_g)
            return jnp.einsum("bgk,bkc->gc", blocks_g, xb,
                              preferred_element_type=jnp.float32)

        return jax.vmap(group)(offs_t, blocks_t)             # (GROUPS, G, C)

    y = jax.vmap(tile)(b.starts, b.offs, b.blocks).reshape(n_pad, C)
    y = y.at[b.ov_rows].add(b.ov_vals[:, None] * x[b.ov_cols, :])
    return y
