"""Degenerate-input robustness: the reference's recovery ladders
(SURVEY §4.3 — NaN-normal wiggle, eigensolver eps-ladder, guard raises)."""

import numpy as np
import pytest

from diffusionnet_tpu.geometry import compute_operators, eigensolve_host
from diffusionnet_tpu.geometry.host_frames import vertex_normals_np
from diffusionnet_tpu.geometry.laplacian import cotan_laplacian, vertex_areas


def test_degenerate_normals_recovery():
    """Duplicate-vertex faces produce zero face normals; the seed-777 wiggle
    ladder (reference geometry.py:128-141) must still yield unit normals."""
    from tests.meshgen import icosphere
    verts, faces = icosphere(subdivisions=1)
    # collapse one vertex onto another -> its incident faces degenerate
    verts = verts.copy()
    verts[1] = verts[0]
    normals = vertex_normals_np(verts, faces)
    assert np.isfinite(normals).all()
    np.testing.assert_allclose(np.linalg.norm(normals, axis=1), 1.0, atol=1e-6)


def test_unreferenced_vertex_gets_random_normal():
    """An unreferenced vertex has no incident faces: the second recovery stage
    assigns a deterministic random unit normal."""
    from tests.meshgen import icosphere
    verts, faces = icosphere(subdivisions=1)
    verts = np.concatenate([verts, [[5.0, 5.0, 5.0]]])  # orphan vertex
    normals = vertex_normals_np(verts, faces)
    assert np.isfinite(normals).all()
    np.testing.assert_allclose(np.linalg.norm(normals, axis=1), 1.0, atol=1e-6)


def test_operators_on_degenerate_mesh():
    """compute_operators end-to-end on a mesh with a collapsed vertex and an
    orphan vertex (degenerate cotans + zero-area corners)."""
    from tests.meshgen import icosphere
    verts, faces = icosphere(subdivisions=1)
    verts = verts.copy()
    verts[1] = verts[0] + 1e-12
    verts = np.concatenate([verts, [[3.0, 0.0, 0.0]]])
    ops = compute_operators(verts, faces, k_eig=4)
    assert np.isfinite(ops.evals).all()
    assert np.isfinite(ops.evecs).all()
    assert (ops.mass > 0).all()  # the +eps*mean shift keeps mass positive


def test_eigensolver_ladder_on_singular_matrix():
    """A graph with isolated components / zero rows exercises the eps-ladder
    retry (reference geometry.py:345-361): it must converge, not crash."""
    import scipy.sparse
    from tests.meshgen import flat_grid
    verts, faces = flat_grid(n=6)
    L = cotan_laplacian(verts, faces)
    mass = vertex_areas(verts, faces)
    # append a fully isolated vertex: zero row/col in L, tiny mass
    V = L.shape[0]
    L2 = scipy.sparse.bmat([[L, None], [None, scipy.sparse.csc_matrix((1, 1))]],
                           format="csc")
    mass2 = np.concatenate([mass, [mass.mean() * 1e-8]])
    evals, evecs = eigensolve_host(L2, mass2, k_eig=3)
    assert np.isfinite(evals).all()
    assert np.isfinite(evecs).all()


def test_hash_collision_probing(tmp_path, monkeypatch):
    """Two different meshes forced to the same hash key must linear-probe into
    distinct cache buckets (reference geometry.py:455-474)."""
    import diffusionnet_tpu.utils as utils
    from diffusionnet_tpu.geometry import get_operators
    from tests.meshgen import icosphere, torus

    monkeypatch.setattr(utils, "hash_arrays", lambda arrs: "FIXEDHASH")
    # operators module imported `utils` as module attribute — patch there too
    import diffusionnet_tpu.geometry.operators as op_mod
    monkeypatch.setattr(op_mod.utils, "hash_arrays", lambda arrs: "FIXEDHASH",
                        raising=True)

    cache = str(tmp_path)
    v1, f1 = icosphere(subdivisions=1)
    v2, f2 = torus(n_major=8, n_minor=6)
    o1 = get_operators(v1, f1, k_eig=4, op_cache_dir=cache)
    o2 = get_operators(v2, f2, k_eig=4, op_cache_dir=cache)
    import os
    assert len(os.listdir(cache)) == 2  # two buckets under one hash
    # both load back correctly
    o1b = get_operators(v1, f1, k_eig=4, op_cache_dir=cache)
    o2b = get_operators(v2, f2, k_eig=4, op_cache_dir=cache)
    np.testing.assert_allclose(o1.evals, o1b.evals, rtol=1e-6)
    np.testing.assert_allclose(o2.evals, o2b.evals, rtol=1e-6)
    assert len(os.listdir(cache)) == 2


def test_cloud_triangulation_native_matches_python():
    """The threaded C++ tangent-plane Delaunay produces the same canonical
    triangle soup as the pure-Python oracle."""
    import numpy as np
    from tests.meshgen import icosphere
    from diffusionnet_tpu.geometry.point_cloud import _local_triangles
    try:
        from diffusionnet_tpu.native import cloud_triangles_native
        verts, _ = icosphere(subdivisions=2)
        tri_n = cloud_triangles_native(verts, 20)
    except Exception:
        import pytest
        pytest.skip("native build unavailable")
    tri_p = _local_triangles(verts, n_neighbors=20)
    # canonical order on both sides
    n = {tuple(t) for t in tri_n.tolist()}
    p = {tuple(t) for t in tri_p.tolist()}
    # tangent-plane sign/tie choices may differ on a handful of slivers
    overlap = len(n & p) / max(len(n | p), 1)
    assert overlap > 0.97, (len(n), len(p), overlap)


def test_point_cloud_laplacian_pathological_inputs():
    """The cloud Laplacian must stay finite/PSD-ish on inputs that break naive
    constructions: noisy thick clouds, exactly coplanar points, duplicated
    points, and isolated outliers (the robust-laplacian value proposition)."""
    import numpy as np
    import scipy.sparse
    import scipy.sparse.linalg as sla
    from diffusionnet_tpu.geometry import point_cloud_laplacian

    rs = np.random.RandomState(7)

    def check(verts, name):
        L, m = point_cloud_laplacian(np.asarray(verts, np.float64))
        assert np.isfinite(L.data).all(), name
        assert np.isfinite(m).all() and (m > 0).all(), name
        # symmetric and near-PSD: smallest eigenvalue ~ 0 (tiny negative
        # allowed from mollification roundoff)
        asym = abs(L - L.T).max()
        assert asym < 1e-9, (name, asym)
        w = sla.eigsh(L + 1e-10 * scipy.sparse.identity(L.shape[0]),
                      k=1, M=scipy.sparse.diags(m), sigma=-1e-6,
                      return_eigenvectors=False)
        assert w[0] > -1e-4, (name, w)

    # noisy thick sphere shell
    v = rs.randn(400, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    check(v * (1.0 + 0.05 * rs.randn(400, 1)), "noisy shell")
    # exactly coplanar cloud (degenerate 3D covariance)
    xy = rs.rand(300, 2)
    check(np.concatenate([xy, np.zeros((300, 1))], axis=1), "coplanar")
    # duplicated points
    v2 = rs.rand(200, 3)
    check(np.concatenate([v2, v2[:50]], axis=0), "duplicates")
    # isolated far outliers
    v3 = rs.rand(300, 3)
    v3[:3] += 100.0
    check(v3, "outliers")


def test_robust_mesh_laplacian_nonmanifold():
    """mesh_laplacian_robust handles soups a plain cotan Laplacian can't:
    nonmanifold edges (3 faces sharing one edge), degenerate slivers, and
    inconsistent orientation — finite, symmetric, PSD, positive mass. On a
    clean manifold mesh it matches the standard cotan operator (mollification
    delta -> 0)."""
    import numpy as np
    import scipy.sparse
    import scipy.sparse.linalg as sla
    from tests.meshgen import icosphere
    from diffusionnet_tpu.geometry import mesh_laplacian_robust
    from diffusionnet_tpu.geometry.laplacian import cotan_laplacian, vertex_areas

    # clean manifold mesh: parity with the standard cotan assembly
    verts, faces = icosphere(subdivisions=2)
    # mollify_factor=0: on a clean mesh the needed delta is 0 -> exact parity
    L_r, m_r = mesh_laplacian_robust(verts, faces, mollify_factor=0.0)
    L_c = cotan_laplacian(verts.astype(np.float64), faces)
    m_c = vertex_areas(verts.astype(np.float64), faces)
    assert abs(L_r - L_c).max() < 1e-8
    np.testing.assert_allclose(m_r, m_c, rtol=1e-10)

    # nonmanifold: 3 triangles sharing edge (0,1) + a sliver + a flipped face
    v = np.array([[0, 0, 0], [1, 0, 0], [0.5, 1, 0], [0.5, -1, 0],
                  [0.5, 0, 1], [2, 0, 0]], float)
    f = np.array([[0, 1, 2], [1, 0, 3], [0, 1, 4],   # fan around edge (0,1)
                  [1, 5, 5],                          # degenerate sliver
                  [2, 1, 0]])                         # duplicate, flipped
    L, m = mesh_laplacian_robust(v, f)
    assert np.isfinite(L.data).all() and (m > 0).all()
    assert abs(L - L.T).max() < 1e-12
    w = sla.eigsh(L + 1e-10 * scipy.sparse.identity(6), k=1,
                  M=scipy.sparse.diags(m), sigma=-1e-6,
                  return_eigenvectors=False)
    assert w[0] > -1e-6
