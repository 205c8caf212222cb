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
