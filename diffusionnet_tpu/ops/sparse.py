"""Fixed-topology sparse operators in ELL format — the TPU-native answer to
torch.sparse SpMM (reference layers.py:216-223 loops torch.mm over the batch because
batched sparse mm doesn't exist there).

Mesh operators (cotan Laplacian L, tangent-gradient gradX/gradY) have bounded row
degree (~one-ring, nnz ~ 7V, SURVEY §5). ELL stores each row padded to a static
max-degree D: `idx (V, D) int32`, `val (V, D) float`. Applying the operator is then a
gather + a small dense contraction `einsum('vd,vdc->vc')` — static shapes, vmappable
over batch, and fused by XLA into the surrounding network. Padding entries carry
val == 0 (idx arbitrary/0), so they are exact no-ops.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class Ell(NamedTuple):
    """A square (n, n) sparse matrix in ELL (padded row-major) layout.

    idx: (..., n, D) int32 column indices per row (padding rows point at 0)
    val: (..., n, D) values (padding entries are exactly 0)
    """
    idx: jnp.ndarray
    val: jnp.ndarray

    @property
    def n(self) -> int:
        return self.idx.shape[-2]

    @property
    def max_degree(self) -> int:
        return self.idx.shape[-1]


def ell_from_coo(rows, cols, vals, n_rows: int, d_max: int | None = None,
                 pad_rows_to: int | None = None, dtype=np.float32):
    """Host-side (numpy) conversion of COO triplets to ELL, summing duplicates.

    d_max: static max row degree; defaults to the actual max (optionally round up
    for bucket stability). pad_rows_to: pad the row dimension (padded rows are
    all-zero). Returns an Ell of numpy arrays (convert with jnp.asarray at use).
    """
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    vals = np.asarray(vals)

    # Sum duplicate (row, col) entries first (COO semantics).
    order = np.lexsort((cols, rows))
    rows, cols, vals = rows[order], cols[order], vals[order]
    key = rows * n_rows + cols
    uniq, inv = np.unique(key, return_inverse=True)
    summed = np.zeros(uniq.shape[0], dtype=vals.dtype)
    np.add.at(summed, inv, vals)
    u_rows = (uniq // n_rows).astype(np.int64)
    u_cols = (uniq % n_rows).astype(np.int64)

    counts = np.bincount(u_rows, minlength=n_rows)
    actual_d = int(counts.max()) if counts.size else 0
    if d_max is None:
        d_max = max(actual_d, 1)
    if actual_d > d_max:
        raise ValueError(f"row degree {actual_d} exceeds d_max={d_max}")

    n_out = pad_rows_to if pad_rows_to is not None else n_rows
    idx = np.zeros((n_out, d_max), dtype=np.int32)
    val = np.zeros((n_out, d_max), dtype=dtype)
    # position of each entry within its row
    starts = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    slot = np.arange(u_rows.shape[0]) - starts[u_rows]
    idx[u_rows, slot] = u_cols.astype(np.int32)
    val[u_rows, slot] = summed.astype(dtype)
    return Ell(idx=idx, val=val)


def ell_matvec(ell: Ell, x):
    """y = A @ x with A in ELL: gather + contraction, broadcast over leading dims.

    ell.idx/val: (..., n, D); x: (..., n, C) -> (..., n, C).
    This is the TPU replacement for the per-batch torch.mm loop at reference
    layers.py:216-223.
    """
    gathered = jnp.take_along_axis(
        x[..., None, :],                      # (..., n, 1, C)
        ell.idx[..., None],                   # (..., n, D, 1)
        axis=-3,
    )                                          # (..., n, D, C)
    # accumulate in f32 even for bf16 operands (the repo-wide mixed-precision
    # contract: bf16 operands, f32 accumulation), then store back in the
    # activation-stream dtype (x's — NOT result_type: f32 operator values
    # over a bf16 stream must not silently promote the activations to f32
    # and double the bandwidth the bf16 mode exists to halve)
    acc = jnp.promote_types(jnp.result_type(ell.val.dtype, x.dtype),
                            jnp.float32)
    return jnp.einsum("...nd,...ndc->...nc", ell.val, gathered,
                      preferred_element_type=acc).astype(x.dtype)


def ell_to_dense(ell: Ell, n: int | None = None):
    """Densify (for the implicit_dense diffusion path and for tests)."""
    n = n if n is not None else ell.n
    if ell.idx.ndim > 2:
        raise ValueError("ell_to_dense expects unbatched Ell; vmap over batch")
    dense = jnp.zeros((ell.n, n), dtype=ell.val.dtype)
    rows = jnp.broadcast_to(
        jnp.arange(ell.n)[:, None], ell.idx.shape)
    return dense.at[rows, ell.idx].add(ell.val)


def ell_pad(ell: Ell, n_rows: int, d_max: int | None = None) -> Ell:
    """Pad an (numpy or jnp) Ell to a larger static (n_rows, d_max)."""
    idx, val = np.asarray(ell.idx), np.asarray(ell.val)
    n0, d0 = idx.shape
    d_max = d_max if d_max is not None else d0
    out_idx = np.zeros((n_rows, d_max), dtype=idx.dtype)
    out_val = np.zeros((n_rows, d_max), dtype=val.dtype)
    out_idx[:n0, :d0] = idx
    out_val[:n0, :d0] = val
    return Ell(idx=out_idx, val=out_val)
