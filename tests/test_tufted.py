"""Tufted intrinsic-Delaunay Laplacian (geometry/tufted.py) — the literal
Sharp & Crane cover with edge flips, completing the robust-laplacian
replacement (reference geometry.py:17,317)."""

import numpy as np
import pytest
import scipy.sparse.linalg as sla

from diffusionnet_tpu.geometry import (cotan_laplacian, vertex_areas,
                                       mesh_laplacian_robust,
                                       tufted_laplacian)
from diffusionnet_tpu.geometry.tufted import (_build_cover, _delaunay_flips,
                                              _corner_cot)

from tests.meshgen import icosphere, flat_grid


def _low_spectrum(L, mass, k=8):
    import scipy.sparse
    M = scipy.sparse.diags(mass)
    w = sla.eigsh(L + 1e-10 * scipy.sparse.identity(L.shape[0]), k=k, M=M,
                  sigma=1e-10, v0=np.random.RandomState(0).randn(L.shape[0]))[0]
    return np.clip(w, 0.0, None)


def test_cover_structure_manifold():
    """On a consistently-oriented manifold mesh the gluing must be the
    orientation double cover: every front halfedge twins with another FRONT
    halfedge on interior edges, and next/twin are valid permutations."""
    verts, faces = icosphere(2)
    tail, nxt, twin = _build_cover(faces)
    H = len(tail)
    assert np.array_equal(np.sort(twin), np.arange(H))   # perfect matching
    assert np.array_equal(twin[twin], np.arange(H))      # involution
    assert np.all(nxt[nxt[nxt]] == np.arange(H))         # 3-cycles
    F = faces.shape[0]
    front = np.arange(3 * F)
    assert np.all(twin[front] < 3 * F)   # closed manifold: fronts glue fronts
    # twins connect opposite directions of the same undirected edge
    head = tail[nxt]
    assert np.all(tail[twin] == head) and np.all(head[twin] == tail)


def test_cover_folds_at_boundary():
    """A mesh with boundary: boundary edges fold front onto back copy, so the
    cover is still closed (twin is total)."""
    verts, faces = flat_grid(n=4)
    tail, nxt, twin = _build_cover(faces)
    assert np.all(twin >= 0)
    assert np.array_equal(twin[twin], np.arange(len(tail)))


def test_noflip_equals_soup_assembly():
    """flip=False must reproduce the raw soup assembly exactly — the
    structural check that cover construction and down-mapping are right."""
    verts, faces = icosphere(2)
    # make it a messy soup: duplicate a few faces with flipped orientation
    soup = np.concatenate([faces, faces[:7, ::-1]], axis=0)
    L_t, m_t = tufted_laplacian(verts, soup, flip=False)
    L_s, m_s = mesh_laplacian_robust(verts, soup)
    assert abs(L_t - L_s).max() < 1e-11
    np.testing.assert_allclose(m_t, m_s, rtol=1e-12)


def test_manifold_delaunay_mesh_matches_cotan():
    """An already-intrinsically-Delaunay manifold mesh (icosphere: near
    equilateral) takes zero flips, and the halved cover operator equals the
    plain cotan Laplacian / barycentric mass up to mollification."""
    verts, faces = icosphere(2)
    L_t, m_t = tufted_laplacian(verts, faces)
    L_c = cotan_laplacian(verts, faces)
    m_c = vertex_areas(verts, faces)
    assert abs(L_t - L_c).max() < 1e-5
    np.testing.assert_allclose(m_t, m_c, rtol=1e-5)


def test_flips_restore_delaunay_and_positive_weights():
    """A grid cut into skinny triangles has non-Delaunay edges and negative
    cotan weights; after intrinsic flips every interior edge satisfies the
    Delaunay condition and all off-diagonal weights are <= 0 (maximum
    principle), while the low spectrum stays close to the unflipped one
    (same surface, different triangulation)."""
    rs = np.random.RandomState(3)
    # anisotropic stretch makes the default diagonal direction non-Delaunay
    verts, faces = flat_grid(n=24, jitter=0.2)
    verts = np.asarray(verts, np.float64).copy()
    verts[:, 0] *= 6.0

    L_plain = cotan_laplacian(verts, faces)
    off_plain = (L_plain - scipy_diag(L_plain)).tocoo()
    assert (off_plain.data > 1e-9).any(), "test mesh should be non-Delaunay"

    L_t, m_t = tufted_laplacian(verts, faces)
    off = (L_t - scipy_diag(L_t)).tocoo()
    assert (off.data <= 1e-9).all(), "flips must restore nonnegative weights"
    # PSD + zero row sums
    assert abs(np.asarray(L_t.sum(axis=1))).max() < 1e-8
    x = rs.randn(L_t.shape[0], 4)
    assert (np.sum(x * (L_t @ x), axis=0) > -1e-8).all()

    # the flipped operator discretizes the same smooth Laplacian: low
    # eigenvalues within a few percent of the unflipped tufted assembly
    # (both are O(h^2) discretizations of the same surface; the gap shrinks
    # under refinement — this grid leaves ~3-5% on the highest mode tested)
    L_0, m_0 = tufted_laplacian(verts, faces, flip=False)
    w_f = _low_spectrum(L_t, m_t)[1:]
    w_0 = _low_spectrum(L_0, m_0)[1:]
    assert np.max(np.abs(w_f - w_0) / w_0) < 0.06

    # mass-regression gate: intrinsic flips preserve the metric, so total
    # area is invariant and every barycentric mass stays positive. (The mass
    # assembly once enumerated triangles by index triples, which flips break
    # — this mesh produced 164% per-vertex and 2% total-area error.)
    assert (m_t > 0).all()
    np.testing.assert_allclose(m_t.sum(), m_0.sum(), rtol=1e-9)
    # flips move area between the corners of flipped quads (up to ~2.2x per
    # vertex on this heavily-stretched grid) but never out of the local
    # neighborhood — bound the ratio as a sanity check
    ratio = m_t / m_0
    assert ratio.min() > 0.2 and ratio.max() < 5.0


def scipy_diag(L):
    import scipy.sparse
    return scipy.sparse.diags(L.diagonal())


def test_nonmanifold_bowtie_and_triple_edge():
    """Nonmanifold inputs: a triple edge (three faces sharing one edge) and a
    bowtie vertex. The tufted operator must exist, be PSD with zero row
    sums, and diffusion from one side must reach the other (connectivity
    preserved by the cover)."""
    verts = np.array([
        [0, 0, 0], [1, 0, 0],          # shared edge 0-1
        [0.5, 1, 0], [0.5, -1, 0], [0.5, 0, 1],   # three wings
    ], dtype=np.float64)
    faces = np.array([[0, 1, 2], [1, 0, 3], [0, 1, 4]])
    L, m = tufted_laplacian(verts, faces)
    assert abs(np.asarray(L.sum(axis=1))).max() < 1e-10
    assert (m > 0).all()
    w = np.linalg.eigvalsh(L.todense())
    assert w.min() > -1e-10
    # exactly one zero mode (connected): second eigenvalue strictly positive
    assert w[1] > 1e-8


def test_flip_count_and_intrinsic_lengths_stay_valid():
    """After flips, every triangle's intrinsic lengths satisfy the triangle
    inequality (flips preserve the metric) and the flip count is finite."""
    verts, faces = flat_grid(n=10, jitter=0.4)
    verts = np.asarray(verts, np.float64).copy()
    verts[:, 1] *= 4.0
    tail, nxt, twin = _build_cover(np.asarray(faces, np.int64))
    from diffusionnet_tpu.geometry.point_cloud import _intrinsic_mollify
    p = np.asarray(verts)[faces]
    l_soup = np.stack([
        np.linalg.norm(p[:, 1] - p[:, 2], axis=-1),
        np.linalg.norm(p[:, 2] - p[:, 0], axis=-1),
        np.linalg.norm(p[:, 0] - p[:, 1], axis=-1)], axis=-1)
    l_soup = _intrinsic_mollify(l_soup)
    length = np.concatenate([l_soup[:, [2, 0, 1]], l_soup[:, [0, 2, 1]]],
                            axis=0).reshape(-1)
    n = _delaunay_flips(tail, nxt, twin, length)
    assert n > 0
    # all edges Delaunay now
    cot_all = _corner_cot(length[nxt], length[nxt[nxt]], length)
    assert (cot_all + cot_all[twin] >= -1e-9).all()
    # triangle inequality around every halfedge's 3-cycle
    h = np.arange(len(tail))
    a = length[h]
    b = length[nxt[h]]
    c = length[nxt[nxt[h]]]
    assert (a + b - c > -1e-12).all()


def test_fuzz_random_soups_stay_valid():
    """Adversarial fuzz: random vertex positions with random (possibly
    repeated, disconnected, inconsistently wound) face index triples — the
    operator must always come back symmetric PSD with zero row sums, finite,
    with strictly positive mass, and every interior cover edge Delaunay."""
    for seed in range(12):
        rs = np.random.RandomState(seed)
        V = rs.randint(5, 40)
        F = rs.randint(2, 60)
        verts = rs.randn(V, 3)
        if seed % 3 == 0:
            verts[:, 2] *= 1e-3            # near-planar (sliver factory)
        if seed % 4 == 0:
            verts[rs.randint(V)] = verts[rs.randint(V)]  # duplicate point
        faces = rs.randint(0, V, size=(F, 3))
        ok = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
              & (faces[:, 0] != faces[:, 2]))
        if not ok.any():
            continue
        L, m = tufted_laplacian(verts, faces)
        Ld = np.asarray(L.todense())
        assert np.isfinite(Ld).all() and np.isfinite(m).all(), seed
        assert (m > 0).all(), seed
        assert abs(Ld - Ld.T).max() < 1e-9, seed
        assert abs(Ld.sum(axis=1)).max() < 1e-7 * max(abs(Ld).max(), 1), seed
        w = np.linalg.eigvalsh(Ld)
        assert w.min() > -1e-7 * max(w.max(), 1), seed


def test_point_cloud_intrinsic_delaunay_option():
    """point_cloud_laplacian(intrinsic_delaunay=True) routes the local-
    Delaunay soup through the tufted iDT cover; spectrum stays close to the
    plain soup path on a clean sphere sampling."""
    from diffusionnet_tpu.geometry import point_cloud_laplacian
    rs = np.random.RandomState(0)
    pts = rs.randn(300, 3)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    L0, m0 = point_cloud_laplacian(pts)
    L1, m1 = point_cloud_laplacian(pts, intrinsic_delaunay=True)
    w0 = _low_spectrum(L0, m0, k=6)[1:]
    w1 = _low_spectrum(L1, m1, k=6)[1:]
    # factor-2 scaling of the soup path cancels in the GEP; both should
    # approximate l(l+1): compare per-eigenvalue within 10%
    assert np.max(np.abs(w1 - w0) / np.maximum(w0, 1e-12)) < 0.10
