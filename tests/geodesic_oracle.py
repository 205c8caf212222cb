"""Brute-force EXACT polyhedral geodesic oracle for small CONVEX meshes.

On a convex polyhedron a shortest geodesic never passes through a vertex
(all vertices are convex corners), so the exact distance is the minimum over
face-path unfoldings of the straight-line distance — enumerable exhaustively
for small meshes. This gives a machine-precision golden for the native ICH
solver on arbitrary random convex hulls (a much stronger exactness check than
analytic spheres, which only bound the discretization error).
"""

from __future__ import annotations

import numpy as np


def _face_adjacency(faces):
    """sorted edge (a,b) -> list of face indices."""
    adj = {}
    for fi, f in enumerate(faces):
        for e in range(3):
            a, b = int(f[e]), int(f[(e + 1) % 3])
            adj.setdefault((min(a, b), max(a, b)), []).append(fi)
    return adj


def _third_vertex_2d(verts, ia, ib, ic, pa2, pb2):
    """Both rigid placements of vertex ic given 2D positions of ia, ib."""
    la = np.linalg.norm(verts[ic] - verts[ia])
    lb = np.linalg.norm(verts[ic] - verts[ib])
    d = pb2 - pa2
    L = np.linalg.norm(d)
    ex = d / L
    ey = np.array([-ex[1], ex[0]])
    x = (la * la - lb * lb + L * L) / (2 * L)
    h = np.sqrt(max(la * la - x * x, 0.0))
    base = pa2 + x * ex
    return base + h * ey, base - h * ey


def _segment_crosses(p, q, a, b):
    """Does segment p->q cross the portal segment a->b (inclusive ends)?"""
    r = q - p
    s = b - a
    den = r[0] * s[1] - r[1] * s[0]
    if abs(den) < 1e-300:
        return False
    ap = a - p
    t = (ap[0] * s[1] - ap[1] * s[0]) / den
    u = (ap[0] * r[1] - ap[1] * r[0]) / den
    return -1e-9 <= t <= 1 + 1e-9 and -1e-9 <= u <= 1 + 1e-9


def exact_convex_geodesic(verts, faces, src: int, dst: int,
                          max_depth: int = 12) -> float:
    """Exact geodesic distance between two vertices of a CONVEX triangle mesh
    by exhaustive face-path unfolding with corridor validity checks."""
    verts = np.asarray(verts, float)
    faces = np.asarray(faces, int)
    if src == dst:
        return 0.0
    adj = _face_adjacency(faces)
    best = [np.inf]

    def recurse(fi, coords, portals, depth, came_from_edge, s2):
        f = [int(v) for v in faces[fi]]
        if dst in f:
            t2 = coords[dst]
            d = np.linalg.norm(t2 - s2)
            if d < best[0] - 1e-15:
                if all(_segment_crosses(s2, t2, a, b) for a, b in portals):
                    best[0] = d
        if depth >= max_depth:
            return
        for e in range(3):
            a, b = f[e], f[(e + 1) % 3]
            key = (min(a, b), max(a, b))
            if key == came_from_edge:
                continue
            pa, pb = coords[a], coords[b]
            # prune: point-to-portal distance lower-bounds any continuation
            ab = pb - pa
            t = np.clip(np.dot(s2 - pa, ab) / max(np.dot(ab, ab), 1e-300),
                        0.0, 1.0)
            if np.linalg.norm(s2 - (pa + t * ab)) >= best[0] - 1e-12:
                continue
            third = [v for v in f if v != a and v != b][0]
            for nfi in adj.get(key, []):
                if nfi == fi:
                    continue
                nf = [int(v) for v in faces[nfi]]
                ic = [v for v in nf if v != a and v != b][0]
                cand_p, cand_m = _third_vertex_2d(verts, a, b, ic, pa, pb)

                def side(p):
                    return np.sign(ab[0] * (p - pa)[1] - ab[1] * (p - pa)[0])

                new_p = cand_p if side(cand_p) != side(coords[third]) \
                    else cand_m
                ncoords = {a: pa, b: pb, ic: new_p}
                recurse(nfi, ncoords, portals + [(pa, pb)], depth + 1, key,
                        s2)

    for fi, f in enumerate(faces):
        f = [int(v) for v in f]
        if src not in f:
            continue
        others = [v for v in f if v != src]
        p0 = np.zeros(2)
        p1 = np.array([np.linalg.norm(verts[others[0]] - verts[src]), 0.0])
        cand_p, _ = _third_vertex_2d(verts, src, others[0], others[1], p0, p1)
        coords = {src: p0, others[0]: p1, others[1]: cand_p}
        recurse(fi, coords, [], 0, None, p0)
    return float(best[0])
