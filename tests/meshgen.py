"""Synthetic analytic meshes for unit tests: icosphere, flat grid, torus."""

from __future__ import annotations

import numpy as np


def icosphere(subdivisions: int = 2, radius: float = 1.0):
    """Subdivided icosahedron projected to the sphere. Returns (verts, faces)."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
    ], dtype=np.float64)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.array([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
    ], dtype=np.int64)

    for _ in range(subdivisions):
        edge_mid: dict[tuple[int, int], int] = {}
        new_faces = []
        verts_list = list(verts)

        def midpoint(a: int, b: int) -> int:
            key = (min(a, b), max(a, b))
            if key not in edge_mid:
                m = verts_list[a] + verts_list[b]
                m = m / np.linalg.norm(m)
                verts_list.append(m)
                edge_mid[key] = len(verts_list) - 1
            return edge_mid[key]

        for f in faces:
            a, b, c = int(f[0]), int(f[1]), int(f[2])
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        verts = np.asarray(verts_list)
        faces = np.asarray(new_faces, dtype=np.int64)

    return verts * radius, faces


def flat_grid(n: int = 16, jitter: float = 0.0, seed: int = 0):
    """n x n unit-square grid in the z=0 plane. Returns (verts, faces)."""
    xs = np.linspace(0.0, 1.0, n)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    verts = np.stack([X.ravel(), Y.ravel(), np.zeros(n * n)], axis=1)
    if jitter:
        rs = np.random.RandomState(seed)
        interior = ((verts[:, 0] > 0) & (verts[:, 0] < 1)
                    & (verts[:, 1] > 0) & (verts[:, 1] < 1))
        verts[:, :2] += interior[:, None] * (rs.rand(n * n, 2) - 0.5) * jitter / n

    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            v00 = i * n + j
            v01 = i * n + j + 1
            v10 = (i + 1) * n + j
            v11 = (i + 1) * n + j + 1
            faces += [[v00, v10, v11], [v00, v11, v01]]
    return verts, np.asarray(faces, dtype=np.int64)


def torus(n_major: int = 24, n_minor: int = 12, R: float = 1.0, r: float = 0.35):
    """Torus mesh. Returns (verts, faces)."""
    verts = []
    for i in range(n_major):
        u = 2 * np.pi * i / n_major
        for j in range(n_minor):
            v = 2 * np.pi * j / n_minor
            verts.append([(R + r * np.cos(v)) * np.cos(u),
                          (R + r * np.cos(v)) * np.sin(u),
                          r * np.sin(v)])
    faces = []
    for i in range(n_major):
        for j in range(n_minor):
            a = i * n_minor + j
            b = ((i + 1) % n_major) * n_minor + j
            c = ((i + 1) % n_major) * n_minor + (j + 1) % n_minor
            d = i * n_minor + (j + 1) % n_minor
            faces += [[a, b, c], [a, c, d]]
    return np.asarray(verts, dtype=np.float64), np.asarray(faces, dtype=np.int64)


def delaunay_sphere(n_verts: int = 1_000_000, seed: int = 0):
    """Genuinely IRREGULAR triangulation of the unit sphere: the convex hull
    (= spherical Delaunay) of n uniform random points. Unlike icosphere
    (semi-regular valence-6) or grids (DIA-structured), the valence
    distribution and sparsity pattern are those of a real scan — the
    adversarial input for structured-operator fast paths (measured at 1M:
    RCM bandwidth 2615, 5231 distinct diagonals; DIA refuses, the dense
    band would be 22 GB). Returns (verts, faces) with outward-oriented
    faces. The continuum spectrum is l*(l+1) with multiplicity 2l+1."""
    from scipy.spatial import ConvexHull

    rs = np.random.RandomState(seed)
    p = rs.randn(n_verts, 3)
    p /= np.linalg.norm(p, axis=1, keepdims=True)
    hull = ConvexHull(p)
    faces = hull.simplices.astype(np.int64)
    # orient all faces outward (ConvexHull winding is arbitrary per face)
    tri = p[faces]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    flip = np.einsum("fd,fd->f", n, tri.mean(axis=1)) < 0
    faces[flip] = faces[flip][:, ::-1]
    return p, faces
