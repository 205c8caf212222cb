"""Blocked-ELL SpMM (ops/blocked_ell.py) — the unstructured-mesh operator
format for eigensolve_device at scales where DIA refuses and the dense RCM
band exceeds memory (reference analogue: ARPACK is sparsity-agnostic,
reference src/diffusion_net/geometry.py:349; this is the TPU-native
equivalent capability).

Covers: build + matvec parity vs scipy (pure-jnp reference AND the Pallas
kernel in interpreter mode), the COO overflow path for groups needing more
panels than NB, and the full eigensolve through banded='blocked' against
the host ARPACK ladder."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import scipy.sparse

from meshgen import icosphere, torus
from diffusionnet_tpu.geometry.laplacian import cotan_laplacian, vertex_areas
from diffusionnet_tpu.ops.blocked_ell import (
    BlockedEll, blocked_ell_from_sparse, blocked_ell_matvec,
    blocked_ell_matvec_ref)


def _device_fmt(b: BlockedEll) -> BlockedEll:
    return b._replace(
        blocks=jnp.asarray(b.blocks), offs=jnp.asarray(b.offs),
        starts=jnp.asarray(b.starts), ov_rows=jnp.asarray(b.ov_rows),
        ov_cols=jnp.asarray(b.ov_cols), ov_vals=jnp.asarray(b.ov_vals),
        perm=None)


@pytest.mark.parametrize("mesh,nb", [("ico", 8), ("ico", 1), ("torus", 8),
                                     ("torus", 2)])
def test_matvec_parity_vs_scipy(mesh, nb):
    """Build + matvec == scipy SpMM on the permuted operator, through both
    the jnp reference and the Pallas interpreter; nb=1/2 force the COO
    overflow path on meshes that need more panels."""
    v, f = icosphere(4) if mesh == "ico" else torus(60, 50)
    L = cotan_laplacian(v, f)
    b = blocked_ell_from_sparse(L, group_rows=32, tile_rows=256, nb=nb,
                                device=False)
    V = L.shape[0]
    rs = np.random.RandomState(0)
    x = np.zeros((b.n_pad, 96), np.float32)
    x[:V] = rs.randn(V, 96)
    Lp = scipy.sparse.csr_matrix(L)[b.perm][:, b.perm]
    y_true = Lp @ x[:V].astype(np.float64)
    scale = np.abs(y_true).max()
    d = _device_fmt(b)
    y_ref = np.asarray(blocked_ell_matvec_ref(d, jnp.asarray(x)))
    assert np.abs(y_ref[:V] - y_true).max() / scale < 5e-6
    assert np.abs(y_ref[V:]).max() == 0.0          # padding rows stay zero
    y_pal = np.asarray(blocked_ell_matvec(d, jnp.asarray(x), interpret=True))
    assert np.abs(y_pal[:V] - y_true).max() / scale < 5e-6
    if nb < 8:
        assert int((np.asarray(b.ov_vals) != 0).sum()) > 0, \
            "nb=%d should overflow on this mesh" % nb


def test_build_rejects_over_budget():
    v, f = icosphere(3)
    L = cotan_laplacian(v, f)
    assert blocked_ell_from_sparse(L, max_bytes=1000) is None


def test_eigensolve_blocked_vs_host_ladder():
    """Full eigensolve through banded='blocked' (jnp reference matvec on
    CPU) against the host ARPACK ladder: eigenvalue parity and subspace
    principal angles on a multiplet-aligned cut."""
    from diffusionnet_tpu.geometry.eigen import (eigensolve_device,
                                                 eigensolve_host)
    from diffusionnet_tpu.ops.sparse import ell_from_coo

    v, f = icosphere(4)  # 2562 verts — above the dense-eigh tiny gate at k=16
    L = cotan_laplacian(v, f)
    m = vertex_areas(v, f)
    k = 16
    coo = scipy.sparse.coo_matrix(L)
    ell = ell_from_coo(coo.row, coo.col, coo.data, L.shape[0])
    ev_b, evec_b = eigensolve_device(ell, jnp.asarray(m, jnp.float32), k,
                                     banded="blocked",
                                     polish=(L, np.asarray(m, np.float64)))
    ev_h, evec_h = eigensolve_host(L, np.asarray(m), k)
    assert np.abs(np.asarray(ev_b) - ev_h).max() / ev_h.max() < 1e-6
    kk = 9  # sphere multiplets: 1 + 3 + 5 (cut at a spectral gap)
    A = np.asarray(evec_b)[:, :kk]
    B = np.asarray(evec_h)[:, :kk]
    M = scipy.sparse.diags(np.asarray(m, np.float64))
    s = np.linalg.svd(A.T @ (M @ B), compute_uv=False)
    assert np.abs(s - 1).max() < 1e-8


def test_blocked_required_raises_over_budget(monkeypatch):
    """banded='blocked' must refuse (not silently fall back) when the panel
    budget cannot hold the operator."""
    from diffusionnet_tpu.geometry import eigen as eigen_mod
    from diffusionnet_tpu.ops.sparse import ell_from_coo
    import diffusionnet_tpu.ops.blocked_ell as be

    v, f = icosphere(4)
    L = cotan_laplacian(v, f)
    m = vertex_areas(v, f)
    coo = scipy.sparse.coo_matrix(L)
    ell = ell_from_coo(coo.row, coo.col, coo.data, L.shape[0])
    orig = be.blocked_ell_from_sparse
    monkeypatch.setattr(
        be, "blocked_ell_from_sparse",
        lambda *a, **kw: orig(*a, **{**kw, "max_bytes": 1000}))
    with pytest.raises(RuntimeError, match="blocked"):
        eigen_mod.eigensolve_device(ell, jnp.asarray(m, jnp.float32), 16,
                                    banded="blocked")
