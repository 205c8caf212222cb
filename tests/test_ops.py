"""Unit tests for the pure-JAX device ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse

from diffusionnet_tpu import ops
from diffusionnet_tpu.ops.sparse import Ell, ell_from_coo, ell_matvec, ell_to_dense


def test_vector_ops(rng):
    x = rng.randn(10, 3).astype(np.float32)
    y = rng.randn(10, 3).astype(np.float32)
    np.testing.assert_allclose(ops.norm(x), np.linalg.norm(x, axis=-1), rtol=1e-6)
    np.testing.assert_allclose(ops.dot(x, y), np.sum(x * y, axis=-1), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(ops.cross(x, y), np.cross(x, y), rtol=1e-5,
                               atol=1e-6)
    n = np.asarray(ops.normalize(x))
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-4)


def test_normalize_raises_on_suspicious_shapes():
    with pytest.raises(ValueError):
        ops.normalize(jnp.ones(3))
    with pytest.raises(ValueError):
        ops.normalize(jnp.ones((4, 7)))


def test_face_quantities(sphere_mesh):
    verts, faces = sphere_mesh
    areas = np.asarray(ops.face_area(jnp.asarray(verts), jnp.asarray(faces)))
    assert (areas > 0).all()
    # sphere area ~ 4*pi (slightly less for the inscribed polyhedron)
    assert abs(areas.sum() - 4 * np.pi) / (4 * np.pi) < 0.02
    normals = np.asarray(ops.face_normals(jnp.asarray(verts), jnp.asarray(faces)))
    np.testing.assert_allclose(np.linalg.norm(normals, axis=-1), 1.0, atol=1e-3)


def test_vertex_normals_sphere(sphere_mesh):
    verts, faces = sphere_mesh
    normals = np.asarray(ops.vertex_normals(jnp.asarray(verts),
                                            jnp.asarray(faces)))
    # On a sphere, vertex normals ~ vertex direction
    cos = np.sum(normals * verts / np.linalg.norm(verts, axis=1, keepdims=True),
                 axis=1)
    assert (cos > 0.99).all()


def test_tangent_frames_orthonormal(sphere_mesh):
    verts, faces = sphere_mesh
    frames = np.asarray(ops.build_tangent_frames(jnp.asarray(verts),
                                                 jnp.asarray(faces)))
    eye = np.einsum("vij,vkj->vik", frames, frames)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-4)


def test_to_from_basis_roundtrip(rng):
    # random M-orthonormal basis: QR in the sqrt(M) metric
    V, K, D = 64, 16, 5
    mass = rng.rand(V).astype(np.float32) + 0.1
    A = rng.randn(V, K).astype(np.float32)
    Q, _ = np.linalg.qr(np.sqrt(mass)[:, None] * A)
    basis = Q / np.sqrt(mass)[:, None]  # phi^T M phi = I

    x = rng.randn(V, D).astype(np.float32)
    spec = ops.to_basis(jnp.asarray(x), jnp.asarray(basis), jnp.asarray(mass))
    back = ops.from_basis(spec, jnp.asarray(basis))
    # projection then reconstruction is idempotent on the basis span
    spec2 = ops.to_basis(back, jnp.asarray(basis), jnp.asarray(mass))
    np.testing.assert_allclose(np.asarray(spec2), np.asarray(spec), atol=1e-4)


def test_hks_matches_direct_sum(rng):
    V, K, S = 32, 8, 4
    evals = np.sort(rng.rand(K)).astype(np.float32)
    evecs = rng.randn(V, K).astype(np.float32)
    scales = np.logspace(-2, 0, S).astype(np.float32)
    out = np.asarray(ops.compute_hks(jnp.asarray(evals), jnp.asarray(evecs),
                                     jnp.asarray(scales)))
    direct = np.zeros((V, S))
    for s in range(S):
        for k in range(K):
            direct[:, s] += np.exp(-evals[k] * scales[s]) * evecs[:, k] ** 2
    np.testing.assert_allclose(out, direct, rtol=1e-4, atol=1e-5)
    # batch dim broadcast
    out_b = np.asarray(ops.compute_hks(jnp.asarray(evals)[None],
                                       jnp.asarray(evecs)[None],
                                       jnp.asarray(scales)[None]))
    np.testing.assert_allclose(out_b[0], out, rtol=1e-5)


def test_find_knn_brute_matches_scipy(rng):
    from scipy.spatial import cKDTree
    src = rng.randn(100, 3).astype(np.float32)
    tgt = rng.randn(200, 3).astype(np.float32)
    d, i = ops.find_knn(jnp.asarray(src), jnp.asarray(tgt), k=5)
    tree = cKDTree(tgt)
    d_ref, i_ref = tree.query(src, k=5)
    np.testing.assert_array_equal(np.asarray(i), i_ref)
    np.testing.assert_allclose(np.asarray(d), d_ref, rtol=1e-4, atol=1e-5)


def test_find_knn_omit_diagonal(rng):
    pts = rng.randn(50, 3).astype(np.float32)
    _, i = ops.find_knn(jnp.asarray(pts), jnp.asarray(pts), k=4,
                        omit_diagonal=True)
    i = np.asarray(i)
    assert not (i == np.arange(50)[:, None]).any()


def test_find_knn_chunked(rng):
    pts = rng.randn(70, 3).astype(np.float32)
    d1, i1 = ops.find_knn(jnp.asarray(pts), jnp.asarray(pts), k=3, chunk_size=16)
    d2, i2 = ops.find_knn(jnp.asarray(pts), jnp.asarray(pts), k=3, chunk_size=70)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_farthest_point_sampling(rng):
    pts = rng.randn(128, 3).astype(np.float32)
    mask = np.asarray(ops.farthest_point_sampling(jnp.asarray(pts), 16))
    assert mask.sum() == 16
    # FPS should spread: min pairwise distance among chosen >> random subset
    chosen = pts[mask]
    from scipy.spatial.distance import pdist
    assert pdist(chosen).min() > pdist(pts[:16]).min()


def test_normalize_positions(rng, sphere_mesh):
    pts = (rng.randn(60, 3) * 3 + 5).astype(np.float32)
    out = np.asarray(ops.normalize_positions(jnp.asarray(pts)))
    np.testing.assert_allclose(out.mean(axis=0), 0.0, atol=1e-5)
    assert abs(np.linalg.norm(out, axis=1).max() - 1.0) < 1e-5

    verts, faces = sphere_mesh
    out2 = np.asarray(ops.normalize_positions(
        jnp.asarray(verts.astype(np.float32)), faces=jnp.asarray(faces),
        method="bbox", scale_method="area"))
    from diffusionnet_tpu.geometry import face_areas_np
    total = face_areas_np(out2.astype(np.float64), faces).sum()
    np.testing.assert_allclose(total, 1.0, rtol=1e-3)


# ---------------------------------------------------------------------------
# ELL sparse format
# ---------------------------------------------------------------------------

def _random_sparse(rng, n=40, density=0.1):
    mat = scipy.sparse.random(n, n, density=density, random_state=rng,
                              format="coo")
    return mat


def test_ell_roundtrip_dense(rng):
    mat = _random_sparse(rng)
    ell = ell_from_coo(mat.row, mat.col, mat.data, mat.shape[0])
    dense = np.asarray(ell_to_dense(Ell(jnp.asarray(ell.idx),
                                        jnp.asarray(ell.val))))
    np.testing.assert_allclose(dense, mat.toarray(), rtol=1e-5, atol=1e-6)


def test_ell_sums_duplicates():
    rows = np.array([0, 0, 1])
    cols = np.array([1, 1, 0])
    vals = np.array([2.0, 3.0, 1.0])
    ell = ell_from_coo(rows, cols, vals, 2)
    dense = np.asarray(ell_to_dense(Ell(jnp.asarray(ell.idx),
                                        jnp.asarray(ell.val))))
    np.testing.assert_allclose(dense, [[0, 5], [1, 0]])


def test_ell_matvec_matches_dense(rng):
    mat = _random_sparse(rng)
    ell = ell_from_coo(mat.row, mat.col, mat.data, mat.shape[0])
    x = rng.randn(mat.shape[0], 7).astype(np.float32)
    y = np.asarray(ell_matvec(Ell(jnp.asarray(ell.idx), jnp.asarray(ell.val)),
                              jnp.asarray(x)))
    np.testing.assert_allclose(y, mat.toarray().astype(np.float32) @ x,
                               rtol=1e-4, atol=1e-5)


def test_ell_matvec_batched(rng):
    mats = [_random_sparse(rng) for _ in range(3)]
    d = max(ell_from_coo(m.row, m.col, m.data, m.shape[0]).idx.shape[1]
            for m in mats)
    ells = [ell_from_coo(m.row, m.col, m.data, m.shape[0], d_max=d)
            for m in mats]
    idx = jnp.asarray(np.stack([e.idx for e in ells]))
    val = jnp.asarray(np.stack([e.val for e in ells]))
    x = rng.randn(3, 40, 5).astype(np.float32)
    y = np.asarray(ell_matvec(Ell(idx, val), jnp.asarray(x)))
    for b in range(3):
        np.testing.assert_allclose(
            y[b], mats[b].toarray().astype(np.float32) @ x[b],
            rtol=1e-4, atol=1e-5)


def test_padded_batches_remainder_filler():
    """Partial final batch: filler samples get labels=-1 (all kinds) and are
    excluded from metrics."""
    from tests.meshgen import icosphere
    from diffusionnet_tpu.data import SurfaceDataset, make_padded_batches

    for kind, label_fn in [
        ("global", lambda v: 1),
        ("vertex", lambda v: np.zeros(v.shape[0], np.int32)),
    ]:
        ds = SurfaceDataset(labels_kind=kind)
        for i in range(5):
            v, f = icosphere(subdivisions=1)
            ds.add(v, f, label_fn(v))
        ds.precompute(k_eig=4, verbose=False)
        batches = list(make_padded_batches(ds, 4, shuffle=False))
        assert len(batches) == 2
        last = batches[1]
        assert last.labels.shape[0] == 4
        # 1 real + 3 filler rows with label -1 everywhere
        filler = last.labels[1:]
        assert (np.asarray(filler) == -1).all()


def test_padded_batches_multibucket():
    """Mixed-size datasets group into vertex buckets, bounding padding waste."""
    from tests.meshgen import icosphere
    from diffusionnet_tpu.data import SurfaceDataset, make_padded_batches

    ds = SurfaceDataset(labels_kind="global")
    for i in range(3):
        ds.add(*icosphere(subdivisions=1), 0)   # 42 verts
    for i in range(3):
        ds.add(*icosphere(subdivisions=3), 1)   # 642 verts
    ds.precompute(k_eig=4, verbose=False)

    batches = list(make_padded_batches(ds, 3, shuffle=False,
                                       buckets=(64, 1024)))
    shapes = sorted(b.verts.shape[1] for b in batches)
    assert shapes == [64, 1024]
    for b in batches:
        if b.verts.shape[1] == 64:
            assert (np.asarray(b.labels) == 0).all()
        else:
            assert (np.asarray(b.labels) == 1).all()


def test_find_knn_largest_omit_diagonal():
    """largest=True with omit_diagonal must exclude the self-match — the
    diagonal is masked to the WORST value for the selection direction (a
    +inf mask is exactly what top_k(largest) would pick first)."""
    pts = jnp.asarray(np.random.RandomState(0).randn(16, 3))
    d, i = ops.find_knn(pts, pts, 3, largest=True, omit_diagonal=True)
    assert not (np.asarray(i) == np.arange(16)[:, None]).any()
    assert np.isfinite(np.asarray(d)).all()
    # and the values really are the farthest non-self distances
    full = np.linalg.norm(np.asarray(pts)[:, None] - np.asarray(pts)[None],
                          axis=-1)
    np.fill_diagonal(full, -np.inf)
    np.testing.assert_allclose(np.asarray(d)[:, 0], full.max(axis=1),
                               rtol=1e-5)


def test_farthest_point_sampling_duplicate_points():
    """FPS must return exactly n_sample True entries even when the cloud
    contains duplicates (min_dists hits 0 everywhere once all distinct
    locations are chosen; a bare argmax would re-pick a chosen index)."""
    pts = jnp.asarray(np.concatenate([np.zeros((9, 3)),
                                      np.ones((1, 3))]).astype(np.float32))
    mask = ops.farthest_point_sampling(pts, 5)
    assert int(np.asarray(mask).sum()) == 5


def test_ell_matvec_bf16_accumulates_f32():
    """bf16 streams keep the repo-wide f32-accumulation contract: summing 512
    ones in bf16 would saturate at 256 (1.0 no longer representable next to
    256 in an 8-bit mantissa), f32 accumulation gives the exact 512. Output
    dtype stays the stream dtype."""
    from diffusionnet_tpu.ops.sparse import Ell, ell_matvec
    D = 512
    idx = jnp.arange(D, dtype=jnp.int32)[None, :]          # row 0 sums all of x
    idx = jnp.concatenate([idx, jnp.zeros((D - 1, D), jnp.int32)], axis=0)
    val = jnp.zeros((D, D), jnp.bfloat16).at[0].set(1.0)
    x = jnp.ones((D, 1), jnp.bfloat16)
    y = ell_matvec(Ell(idx, val), x)
    assert y.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(y[0, 0], np.float32), 512.0)
    # f32 path unchanged
    y32 = ell_matvec(Ell(idx, val.astype(jnp.float32)), x.astype(jnp.float32))
    assert y32.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(y32[0, 0]), 512.0)
    # mixed: f32 operator values over a bf16 stream must NOT promote the
    # activations to f32 (that silently doubles the bandwidth bf16 halves)
    ymix = ell_matvec(Ell(idx, val.astype(jnp.float32)), x)
    assert ymix.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(ymix[0, 0], np.float32), 512.0)
