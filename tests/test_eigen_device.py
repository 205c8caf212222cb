"""TPU/device LOBPCG eigensolver vs the host ARPACK path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionnet_tpu.geometry import (
    cotan_laplacian, vertex_areas, eigensolve_host, eigensolve_device,
)
from diffusionnet_tpu.ops.sparse import Ell, ell_from_coo, ell_pad


def _ell_of(L, v_pad=None):
    coo = L.tocoo()
    ell = ell_from_coo(coo.row, coo.col, coo.data, L.shape[0])
    if v_pad:
        ell = ell_pad(ell, v_pad)
    return Ell(jnp.asarray(ell.idx), jnp.asarray(ell.val))


def test_device_lobpcg_matches_host(sphere_mesh):
    verts, faces = sphere_mesh
    L = cotan_laplacian(verts, faces)
    mass = vertex_areas(verts, faces)
    k = 9

    evals_h, evecs_h = eigensolve_host(L, mass, k_eig=k)
    evals_d, evecs_d = eigensolve_device(
        _ell_of(L), jnp.asarray(mass.astype(np.float32)), k_eig=k, n_iter=120)
    evals_d = np.asarray(evals_d)
    evecs_d = np.asarray(evecs_d)

    # eigenvalues match (sphere spectrum 0,2,2,2,6,...)
    np.testing.assert_allclose(evals_d, evals_h, atol=0.05)

    # eigenvectors are gauge-dependent; compare the subspace projectors
    # P = Phi Phi^T M on the degenerate blocks (0 | 1-3 | 4-8)
    M = mass[:, None]
    for lo, hi in [(0, 1), (1, 4), (4, 9)]:
        Ph = evecs_h[:, lo:hi] @ (evecs_h[:, lo:hi].T * M.T)
        Pd = evecs_d[:, lo:hi] @ (evecs_d[:, lo:hi].T * M.T)
        np.testing.assert_allclose(Pd, Ph, atol=5e-3)

    # M-orthonormality
    G = evecs_d.T @ (mass[:, None] * evecs_d)
    np.testing.assert_allclose(G, np.eye(k), atol=1e-2)


def test_device_lobpcg_with_padding(sphere_mesh):
    """Padded rows (mass=0, zero operator rows) must not pollute the smallest-k."""
    verts, faces = sphere_mesh
    V = verts.shape[0]
    v_pad = V + 62
    L = cotan_laplacian(verts, faces)
    mass = np.zeros(v_pad, np.float32)
    mass[:V] = vertex_areas(verts, faces)
    k = 6

    evals_h, _ = eigensolve_host(L, mass[:V], k_eig=k)
    evals_d, evecs_d = eigensolve_device(
        _ell_of(L, v_pad=v_pad), jnp.asarray(mass), k_eig=k, n_iter=120)
    np.testing.assert_allclose(np.asarray(evals_d), evals_h, atol=0.05)
    # padded rows of evecs are exactly zero (scaled by 1/sqrt(mass)=0 rule)
    assert np.abs(np.asarray(evecs_d)[V:]).max() == 0.0


def test_compute_operators_device_eigensolver(sphere_mesh):
    """compute_operators(eigensolver='device') produces the same spectrum as
    the host path (sphere eigenvalues l(l+1))."""
    from diffusionnet_tpu.geometry import compute_operators
    verts, faces = sphere_mesh
    ops = compute_operators(verts, faces, k_eig=9, eigensolver="device")
    expected = np.array([0.0] + [2.0] * 3 + [6.0] * 5)
    np.testing.assert_allclose(ops.evals, expected, atol=0.1)
    # gradX_spec must be built from the device eigenvectors consistently
    assert ops.gradX_spec.shape == (verts.shape[0], 9)


def test_get_operators_device_eigensolver_plumbing(sphere_mesh, tmp_path):
    """The high-level cached entry point exposes the TPU eigensolver:
    get_operators(eigensolver='device') computes on-device and writes the
    shared geometry-keyed cache; a later 'host' request loads that entry."""
    from diffusionnet_tpu.geometry import get_operators
    verts, faces = sphere_mesh
    ops = get_operators(verts, faces, k_eig=6, op_cache_dir=str(tmp_path),
                        eigensolver="device")
    expected = np.array([0.0] + [2.0] * 3 + [6.0] * 2)
    np.testing.assert_allclose(ops.evals, expected, atol=0.1)
    # the cache is shared across solvers: the host request must hit it
    ops2 = get_operators(verts, faces, k_eig=6, op_cache_dir=str(tmp_path),
                         eigensolver="host")
    np.testing.assert_array_equal(np.asarray(ops.evals, np.float32),
                                  ops2.evals)


def test_dataset_precompute_device_eigensolver(sphere_mesh):
    """SurfaceDataset.precompute(eigensolver='device') end-to-end."""
    from diffusionnet_tpu.data import SurfaceDataset
    verts, faces = sphere_mesh
    ds = SurfaceDataset(labels_kind="global")
    ds.add(verts, faces, 0)
    ds.precompute(k_eig=6, verbose=False, eigensolver="device")
    np.testing.assert_allclose(ds.ops_list[0].evals[1:4], 2.0, atol=0.1)


def test_device_eigensolver_tiny_mass_isolated_vertex():
    """An isolated vertex with near-zero mass must not push lambda_max(C)
    outside the Chebyshev interval (the eps*M^-1 regularization term has to
    be inside the spectral-radius bound, else T_n overflows f32 and LOBPCG
    returns garbage with no error)."""
    import jax
    import jax.numpy as jnp
    from tests.meshgen import icosphere
    from diffusionnet_tpu.geometry import cotan_laplacian, vertex_areas
    from diffusionnet_tpu.geometry.eigen import eigensolve_device
    from diffusionnet_tpu.ops.sparse import ell_from_coo

    sverts, faces = icosphere(2)
    V = sverts.shape[0] + 1  # plus one isolated vertex
    L = cotan_laplacian(sverts, faces).tocoo()
    ell = jax.tree.map(jnp.asarray,
                       ell_from_coo(L.row, L.col, L.data, n_rows=V))
    mass = np.concatenate([vertex_areas(sverts, faces), [1e-12]])
    evals, evecs = eigensolve_device(ell, jnp.asarray(mass, jnp.float32),
                                     k_eig=6)
    e = np.asarray(evals)
    assert np.isfinite(e).all()
    np.testing.assert_allclose(e[:4], [0.0, 2.0, 2.0, 2.0], atol=0.3)

    # cheb_degree < 2 must be rejected, not silently compute a wrong filter
    import pytest
    with pytest.raises(ValueError):
        eigensolve_device(ell, jnp.asarray(mass, jnp.float32), k_eig=4,
                          cheb_degree=0)


def test_eigensolve_device_sharded_matches_host(cpu_devices):
    """The vert-sharded solver (8-way row-sharded blocks, all-gather SpMM,
    psum Gram/RR) matches ARPACK through the same gauge-invariant lens and
    keeps padded rows exactly zero."""
    from jax.sharding import Mesh
    from tests.meshgen import icosphere
    from diffusionnet_tpu.geometry.eigen import eigensolve_device_sharded

    verts, faces = icosphere(3)
    V = verts.shape[0]
    v_pad = 648  # divisible by 8
    L = cotan_laplacian(verts, faces)
    mass_np = vertex_areas(verts, faces)
    coo = L.tocoo()
    ell = ell_from_coo(coo.row, coo.col, coo.data, V)
    ell = ell_pad(ell, v_pad)
    ell = Ell(jnp.asarray(ell.idx), jnp.asarray(ell.val))
    mass = np.zeros(v_pad, np.float32)
    mass[:V] = mass_np
    mesh = Mesh(np.asarray(cpu_devices), axis_names=("vert",))

    ev, evec = eigensolve_device_sharded(ell, jnp.asarray(mass), k_eig=16,
                                         mesh=mesh)
    evh, _ = eigensolve_host(L, mass_np, 16)
    np.testing.assert_allclose(np.asarray(ev), evh,
                               atol=1e-4 * evh.max())
    assert np.abs(np.asarray(evec)[V:]).max() == 0.0
    # M-orthonormality of the valid rows
    E = np.asarray(evec)[:V]
    G = E.T @ (mass_np[:, None] * E)
    np.testing.assert_allclose(G, np.eye(16), atol=1e-4)
    # V not divisible by shards is refused loudly
    import pytest
    bad = Ell(ell.idx[:642], ell.val[:642])
    with pytest.raises(ValueError, match="divisible"):
        eigensolve_device_sharded(bad, jnp.asarray(mass[:642]), k_eig=4,
                                  mesh=mesh)


def test_compute_operators_device_fallback_to_host(sphere_mesh, monkeypatch):
    """compute_operators(eigensolver='device') falls back to the host ARPACK
    ladder when the device solve reports non-convergence (the eps-ladder
    failure semantics stay reachable from the default path)."""
    import warnings
    from diffusionnet_tpu.geometry import compute_operators
    from diffusionnet_tpu.geometry import operators as ops_mod
    import diffusionnet_tpu.geometry.eigen as eigen_mod

    def boom(*a, **k):
        raise RuntimeError("synthetic non-convergence")

    monkeypatch.setattr(eigen_mod, "eigensolve_device", boom)
    verts, faces = sphere_mesh
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        ops = compute_operators(verts, faces, k_eig=6, eigensolver="device")
    assert any("falling back" in str(x.message) for x in w)
    expected = np.array([0.0] + [2.0] * 3 + [6.0] * 2)
    np.testing.assert_allclose(ops.evals, expected, atol=0.1)


def test_eigensolve_device_parity_gate_20k():
    """VERDICT r2 item 1 gate: at ~20k vertices, k=128, the device solver
    matches the ARPACK ladder to <= 1e-4 in every GAUGE-INVARIANT quantity
    the network consumes — eigenvalue band, heat-diffusion outputs
    D_t x = Phi e^{-lambda t}(Phi^T M x), and HKS. (Raw eigenvectors are
    gauge-dependent and not comparable.)"""
    from tests.meshgen import flat_grid
    from diffusionnet_tpu.geometry.eigen import eigensolve_device

    verts, faces = flat_grid(n=142, jitter=0.4)    # 20164 verts
    V = verts.shape[0]
    k = 128
    L = cotan_laplacian(verts, faces)
    mass = vertex_areas(verts, faces)
    mass = mass + 1e-8 * np.mean(mass)

    evh, eveh = eigensolve_host(L, mass, k)
    coo = L.tocoo()
    ell = ell_from_coo(coo.row, coo.col, coo.data, V)
    ell = Ell(jnp.asarray(ell.idx), jnp.asarray(ell.val))

    rng = np.random.RandomState(0)
    x = rng.randn(V, 4)
    ts = np.logspace(-3, 0, 6) / max(evh[1], 1e-12)

    def gauge_invariant_errs(evd, evecd):
        band = np.abs(evd - evh).max() / evh.max()
        diff = 0.0
        for t in ts:
            dh = eveh @ (np.exp(-evh * t)[:, None]
                         * (eveh.T @ (mass[:, None] * x)))
            dd = evecd @ (np.exp(-evd * t)[:, None]
                          * (evecd.T @ (mass[:, None] * x)))
            diff = max(diff, np.abs(dd - dh).max()
                       / (np.abs(dh).max() + 1e-30))
        hks_h = (eveh ** 2) @ np.exp(-evh[:, None] * ts[None, :])
        hks_d = (evecd ** 2) @ np.exp(-evd[:, None] * ts[None, :])
        hks = np.abs(hks_d - hks_h).max() / (np.abs(hks_h).max() + 1e-30)
        return band, diff, hks

    # the compute_operators path: device sweeps + f64 RR polish
    evd, evecd = eigensolve_device(ell, jnp.asarray(mass, jnp.float32), k,
                                   polish=(L, mass))
    band, diff, hks = gauge_invariant_errs(np.asarray(evd, np.float64),
                                           np.asarray(evecd, np.float64))
    assert band <= 1e-5, band
    assert diff <= 1e-4, diff
    assert hks <= 1e-4, hks

    # pure-device (no polish): accuracy bounded by the f32 matvec noise
    # floor; pin it so regressions in the sweeps themselves are caught
    evd, evecd = eigensolve_device(ell, jnp.asarray(mass, jnp.float32), k)
    band, diff, hks = gauge_invariant_errs(np.asarray(evd, np.float64),
                                           np.asarray(evecd, np.float64))
    assert band <= 1e-4, band
    assert diff <= 1e-3, diff
    assert hks <= 1e-3, hks


def test_eigensolve_device_banded_matches_ell(sphere_mesh):
    """The banded-dense sweep path (RCM reorder + per-tile MXU matmuls) and
    the ELL gather path solve the same problem: spectra match ARPACK and
    each other; banded_matvec itself matches scipy."""
    verts, faces = sphere_mesh
    L = cotan_laplacian(verts, faces)
    mass = vertex_areas(verts, faces)
    k = 12

    evh, _ = eigensolve_host(L, mass, k)
    mj = jnp.asarray(mass.astype(np.float32))
    ell = _ell_of(L)
    ev_b, evec_b = eigensolve_device(ell, mj, k, banded=True)
    ev_e, evec_e = eigensolve_device(ell, mj, k, banded=False)
    np.testing.assert_allclose(np.asarray(ev_b), evh, atol=1e-4 * evh.max())
    np.testing.assert_allclose(np.asarray(ev_e), evh, atol=1e-4 * evh.max())
    # both bases are M-orthonormal
    for E in (np.asarray(evec_b), np.asarray(evec_e)):
        G = E.T @ (mass[:, None] * E)
        np.testing.assert_allclose(G, np.eye(k), atol=1e-4)

    # banded_matvec vs scipy on the raw operator
    from diffusionnet_tpu.ops.banded import banded_from_sparse, banded_matvec
    b = banded_from_sparse(L, tile_rows=64)
    x = np.random.RandomState(0).randn(L.shape[0], 8).astype(np.float32)
    n_pad = b.band.shape[0] * b.band.shape[1]
    xp = np.zeros((n_pad, 8), np.float32)
    xp[:L.shape[0]] = x[b.perm]
    y_perm = np.asarray(banded_matvec(
        b._replace(band=jnp.asarray(b.band), starts=jnp.asarray(b.starts)),
        jnp.asarray(xp)))[:L.shape[0]]
    inv = np.empty(L.shape[0], np.int64)
    inv[b.perm] = np.arange(L.shape[0])
    np.testing.assert_allclose(y_perm[inv], L @ x, atol=2e-5)


def test_banded_device_build_matches_host(sphere_mesh):
    """banded_from_sparse_device (on-device nnz scatter — what the
    eigensolver uses so the dense band never crosses the host->device link)
    must produce bit-identical band/starts/perm to the host oracle."""
    from diffusionnet_tpu.ops.banded import (banded_from_sparse,
                                             banded_from_sparse_device)
    verts, faces = sphere_mesh
    L = cotan_laplacian(verts, faces)
    bh = banded_from_sparse(L, tile_rows=64)
    bd = banded_from_sparse_device(L, tile_rows=64)
    np.testing.assert_array_equal(np.asarray(bd.band), bh.band)
    np.testing.assert_array_equal(np.asarray(bd.starts), bh.starts)
    np.testing.assert_array_equal(bd.perm, bh.perm)
    assert bd.n == bh.n


def test_eigensolve_device_tiny_dense_path(sphere_mesh):
    """Sub-4x-subspace problems route to the exact dense eigh: the filtered
    sweeps cannot separate a band spanning most of the spectrum (a 42-vert
    driver-smoke mesh stagnated at residual ~6 and fell back to ARPACK with
    a warning). The dense path must match the host ladder exactly and
    zero out padded rows."""
    from tests.meshgen import icosphere
    from diffusionnet_tpu.ops.sparse import ell_pad

    verts, faces = icosphere(1)  # 42 verts
    rng = np.random.RandomState(3)
    verts = verts + 0.01 * rng.randn(*verts.shape)
    L = cotan_laplacian(verts, faces)
    mass = vertex_areas(verts, faces)
    k = 8

    evals_h, evecs_h = eigensolve_host(L, mass, k_eig=k)
    evals_d, evecs_d = eigensolve_device(
        _ell_of(L), jnp.asarray(mass.astype(np.float32)), k_eig=k)
    np.testing.assert_allclose(np.asarray(evals_d), evals_h,
                               atol=1e-4 * max(evals_h.max(), 1.0))
    # gauge-invariant subspace parity: projector Phi Phi^T M over the band
    M = mass[:, None]
    Ph = evecs_h @ (evecs_h.T * M.T)
    Pd = np.asarray(evecs_d) @ (np.asarray(evecs_d).T * M.T)
    np.testing.assert_allclose(Pd, Ph, atol=1e-3)

    # padded variant: padded rows exactly zero, spectrum unchanged
    V = verts.shape[0]
    v_pad = V + 22
    mass_p = np.zeros(v_pad, np.float32)
    mass_p[:V] = mass
    evals_p, evecs_p = eigensolve_device(
        _ell_of(L, v_pad=v_pad), jnp.asarray(mass_p), k_eig=k)
    np.testing.assert_allclose(np.asarray(evals_p), evals_h,
                               atol=1e-4 * max(evals_h.max(), 1.0))
    assert np.all(np.asarray(evecs_p)[V:] == 0.0)


def test_compute_operators_tiny_mesh_device_no_fallback(recwarn):
    """compute_operators(eigensolver='device') on a tiny mesh must use the
    dense path silently — no 'falling back to the host ARPACK ladder'
    UserWarning (it fired on every driver-smoke mesh before)."""
    from tests.meshgen import icosphere
    from diffusionnet_tpu.geometry import compute_operators

    verts, faces = icosphere(1)
    ops = compute_operators(verts, faces, k_eig=8, eigensolver="device")
    assert not [w for w in recwarn.list
                if "falling back" in str(w.message)]
    ops_h = compute_operators(verts, faces, k_eig=8, eigensolver="host")
    np.testing.assert_allclose(ops.evals, ops_h.evals, atol=1e-4)


@pytest.mark.parametrize("mesh_kind,k", [
    ("ico2", 32),       # V=162,  n_cols=40  (ratio 4.05 — just past old gate)
    ("torus_s", 32),    # V=288,  n_cols=40  (ratio 7.2)
    ("torus_m", 128),   # V=1200, n_cols=160 (ratio 7.5 — worst observed)
])
def test_eigensolve_device_midratio_dense_path(mesh_kind, k, recwarn):
    """Meshes whose subspace spans > ~1/10 of the spectrum stagnate in the
    filtered sweeps (measured boundary: V/n_cols <= 7.5 always stagnated,
    >= 9.8 always converged on sphere/torus/grid families); the dense-eigh
    gate at 12x routes them to the exact path. These three shapes all fell
    back to ARPACK with a warning before the gate was widened."""
    from tests.meshgen import icosphere, torus
    from diffusionnet_tpu.geometry import compute_operators

    if mesh_kind == "ico2":
        verts, faces = icosphere(2)
    elif mesh_kind == "torus_s":
        verts, faces = torus(n_major=24, n_minor=12)
    else:
        verts, faces = torus(n_major=50, n_minor=24)

    ops = compute_operators(verts, faces, k_eig=k, eigensolver="device")
    assert not [w for w in recwarn.list
                if "falling back" in str(w.message)], \
        "device eigensolver must not fall back to ARPACK on mid-ratio meshes"
    ops_h = compute_operators(verts, faces, k_eig=k, eigensolver="host")
    scale = max(float(np.max(ops_h.evals)), 1.0)
    np.testing.assert_allclose(ops.evals, ops_h.evals, atol=1e-4 * scale)
    # gauge-invariant parity: heat-diffusion outputs (these symmetric meshes
    # have degenerate clusters at the band edge, so the truncated subspace
    # itself is gauge-ambiguous — raw projectors are NOT comparable; the
    # e^{-t lambda} weighting damps the ambiguous edge)
    evh = np.asarray(ops_h.evals, np.float64)
    evd = np.asarray(ops.evals, np.float64)
    Eh = np.asarray(ops_h.evecs, np.float64)
    Ed = np.asarray(ops.evecs, np.float64)
    m = np.asarray(ops_h.mass, np.float64)
    rng = np.random.RandomState(0)
    x = rng.randn(len(m), 4)
    # (a) diffusion outputs at t large enough that e^{-t lambda_k} <= 6e-6
    # damps the ambiguous band edge below the tolerance
    for t in np.asarray([12.0, 24.0, 48.0]) / max(evh[k - 1], 1e-12):
        dh = Eh @ (np.exp(-evh * t)[:, None] * (Eh.T @ (m[:, None] * x)))
        dd = Ed @ (np.exp(-evd * t)[:, None] * (Ed.T @ (m[:, None] * x)))
        err = np.abs(dd - dh).max() / (np.abs(dh).max() + 1e-30)
        assert err <= 1e-4, (t, err)
    # (b) projector parity over a cluster-closed prefix: truncate at the
    # largest j <= k preceded by a real spectral gap, where the spanned
    # subspace IS well-defined
    gaps = (evh[1:k] - evh[:k - 1]) / max(evh[k - 1], 1e-12)
    closed = np.where(gaps >= 1e-3)[0]
    assert closed.size, "no spectral gap in the band — test mesh unusable"
    j = int(closed[-1]) + 1
    Mw = m[None, :]
    np.testing.assert_allclose(
        Ed[:, :j] @ (Ed[:, :j].T * Mw), Eh[:, :j] @ (Eh[:, :j].T * Mw),
        atol=2e-3)


def test_rr_polish_scipy_fallback_without_native(sphere_mesh, monkeypatch):
    """The documented no-compiler fallback: when the native build is
    unavailable, _rr_polish_host must degrade to scipy SpMM, not crash at
    the first matvec (the lazy get_lib() raises at CALL time, so the
    fallback probe must force the build before choosing the kernel)."""
    import diffusionnet_tpu.native.build as build
    from diffusionnet_tpu.geometry.eigen import _rr_polish_host

    verts, faces = sphere_mesh
    L = cotan_laplacian(verts, faces)
    mass = vertex_areas(verts, faces)
    k = 8
    rng = np.random.RandomState(3)
    Y = rng.randn(L.shape[0], k + 4)

    # certify_tol=None: Y is a RANDOM basis (this test compares kernels, not
    # accuracy) and the f64 certification would rightly reject its polish
    ev_native, Q_native = _rr_polish_host(L, mass, Y, k_eig=k, eps=1e-8,
                                          certify_tol=None)

    def boom():
        raise RuntimeError("native build failed (simulated: no compiler)")

    monkeypatch.setattr(build, "get_lib", boom)
    ev_fb, Q_fb = _rr_polish_host(L, mass, Y, k_eig=k, eps=1e-8,
                                  certify_tol=None)
    np.testing.assert_allclose(ev_fb, ev_native, rtol=1e-10, atol=1e-12)
    # same subspace (gauge-invariant projector comparison)
    m = np.asarray(mass, np.float64)
    P = lambda Q: Q @ (Q.T * m[None, :])
    np.testing.assert_allclose(P(Q_fb), P(Q_native), atol=1e-9)


def test_csr_spmm_native_accepts_csc():
    """A CSC operand must not silently compute A.T @ B (same attrs, row/col
    pointers swapped) — the kernel converts to CSR first."""
    import scipy.sparse
    from diffusionnet_tpu.native import csr_spmm_native

    rng = np.random.RandomState(0)
    A = scipy.sparse.random(64, 64, density=0.1, random_state=rng,
                            format="csr")
    A = (A - 2 * A.T).tocsr()  # deliberately non-symmetric
    B = rng.randn(64, 5)
    ref = A @ B
    np.testing.assert_allclose(csr_spmm_native(A, B), ref, atol=1e-12)
    np.testing.assert_allclose(csr_spmm_native(A.tocsc(), B), ref,
                               atol=1e-12)


def test_cheb_segmented_filter_matches_unsegmented():
    """The segmented Chebyshev filter (short device programs carrying the
    recurrence state, used at large V where one long program trips execution
    watchdogs) is the SAME arithmetic as the fused filter — results must
    match to f32 roundoff."""
    from tests.meshgen import flat_grid

    verts, faces = flat_grid(n=40, jitter=0.3, seed=4)   # 1600 verts
    L = cotan_laplacian(verts, faces)
    mass = vertex_areas(verts, faces)
    k = 12

    ev0, evec0 = eigensolve_device(
        _ell_of(L), jnp.asarray(mass.astype(np.float32)), k_eig=k,
        cheb_segment=0)
    ev1, evec1 = eigensolve_device(
        _ell_of(L), jnp.asarray(mass.astype(np.float32)), k_eig=k,
        cheb_segment=7)   # deliberately not dividing the degree evenly
    ev0, ev1 = np.asarray(ev0), np.asarray(ev1)
    np.testing.assert_allclose(ev1, ev0, rtol=1e-5, atol=1e-6)
    # subspace projector parity (gauge-invariant)
    M = np.asarray(mass, np.float64)[:, None]
    P0 = np.asarray(evec0, np.float64) @ (np.asarray(evec0, np.float64).T * M.T)
    P1 = np.asarray(evec1, np.float64) @ (np.asarray(evec1, np.float64).T * M.T)
    np.testing.assert_allclose(P1, P0, atol=5e-4)


def test_dia_path_matches_ell(sphere_mesh):
    """The DIA operator path (structured meshes: statically-shifted
    elementwise matvec, no gather — the 1M single-chip fast path) produces
    the same eigenpairs as the ELL gather path on a grid mesh, and
    banded='dia' on an unstructured mesh raises loudly."""
    from tests.meshgen import flat_grid
    from diffusionnet_tpu.ops.banded import dia_from_sparse, dia_matvec

    verts, faces = flat_grid(n=40, jitter=0.3, seed=7)    # 1600 verts
    L = cotan_laplacian(verts, faces)
    mass = vertex_areas(verts, faces)
    k = 12

    # raw matvec parity vs scipy
    rep = dia_from_sparse(L)
    assert rep is not None and len(rep[1]) == 7, rep and rep[1]
    rng = np.random.RandomState(0)
    X = rng.randn(L.shape[0], 5).astype(np.float32)
    y_dia = np.asarray(dia_matvec(jnp.asarray(rep[0]), rep[1],
                                  jnp.asarray(X)))
    np.testing.assert_allclose(y_dia, (L @ X.astype(np.float64)),
                               rtol=1e-4, atol=1e-5)

    ev_ell, evec_ell = eigensolve_device(
        _ell_of(L), jnp.asarray(mass.astype(np.float32)), k_eig=k,
        banded=False)
    ev_dia, evec_dia = eigensolve_device(
        _ell_of(L), jnp.asarray(mass.astype(np.float32)), k_eig=k,
        banded="dia")
    # atol scaled to the band top: the zero mode lands at f32 noise (~1e-5)
    # under either operator, with different noise
    np.testing.assert_allclose(np.asarray(ev_dia), np.asarray(ev_ell),
                               rtol=1e-4, atol=1e-5 * float(ev_ell[-1]))
    M = np.asarray(mass, np.float64)[:, None]
    P = lambda E: np.asarray(E, np.float64) @ (np.asarray(E, np.float64).T
                                               * M.T)
    np.testing.assert_allclose(P(evec_dia), P(evec_ell), atol=5e-4)

    # segmented DIA filter (the 1M configuration) agrees too
    ev_seg, _ = eigensolve_device(
        _ell_of(L), jnp.asarray(mass.astype(np.float32)), k_eig=k,
        banded="dia", cheb_segment=7)
    np.testing.assert_allclose(np.asarray(ev_seg), np.asarray(ev_dia),
                               rtol=1e-5, atol=1e-6)

    # unstructured mesh: banded='dia' must refuse, not silently fall back
    sverts, sfaces = sphere_mesh
    Ls = cotan_laplacian(sverts, sfaces)
    ms = vertex_areas(sverts, sfaces)
    if dia_from_sparse(Ls) is None:   # icosphere is unstructured enough
        import pytest as _pytest
        with _pytest.raises(RuntimeError, match="dia"):
            eigensolve_device(_ell_of(Ls),
                              jnp.asarray(ms.astype(np.float32)), k_eig=6,
                              banded="dia")
