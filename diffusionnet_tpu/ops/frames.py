"""Vertex normals, tangent frames, and edge tangent vectors — pure jnp, jittable.

Capability parity with reference geometry.py:92-206. TPU-first differences:
  * scatter accumulation uses jnp `.at[].add` (XLA scatter) instead of np.add.at;
  * the NaN "wiggle" recovery of the reference (geometry.py:128-141) is replaced by a
    branch-free fallback: any vertex whose accumulated normal is ~zero gets a
    deterministic pseudo-random unit normal (no data-dependent control flow under jit);
  * optional `face_mask` / `vert_mask` for padded fixed-shape batching.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .vector import cross, dot, face_normals, normalize, norm, project_to_tangent


def mesh_vertex_normals(verts, faces, face_mask=None):
    """Area-weighted (unnormalized face normal weighted) vertex normals.

    Reference geometry.py:101-111 accumulates *unit* face normals with np.add.at.
    We keep that convention (unit face normals, uniform weight per incident face).
    `face_mask` zeroes contributions of padded faces.
    """
    face_n = face_normals(verts, faces)  # (F,3) unit normals
    if face_mask is not None:
        face_n = face_n * face_mask[:, None]
    vertex_normals = jnp.zeros_like(verts)
    for i in range(3):
        vertex_normals = vertex_normals.at[faces[:, i]].add(face_n)
    return vertex_normals / (norm(vertex_normals) + 1e-20)[:, None]


def _fallback_normals(verts):
    """Deterministic pseudo-random unit normals for degenerate vertices.

    Plays the role of the reference's seed-777 wiggle/reseed recovery
    (geometry.py:128-141) without host control flow: hash vertex positions into
    a direction. Only used where the accumulated normal vanished."""
    key = jax.random.PRNGKey(777)
    r = jax.random.uniform(key, verts.shape, dtype=verts.dtype) - 0.5
    return r / (norm(r) + 1e-20)[:, None]


def vertex_normals(verts, faces=None, n_neighbors_cloud: int = 30, face_mask=None,
                   neigh_inds=None):
    """Outward-ish vertex normals for a mesh or point cloud.

    Mesh path (faces given): area-weighted face-normal accumulation with degenerate
    fallback. Cloud path (faces None): SVD plane fit over `n_neighbors_cloud`
    neighborhoods (reference geometry.py:114-122). For the cloud path you may pass
    precomputed `neigh_inds` (V,k) to avoid an O(V^2) kNN under jit.
    """
    if faces is None or (hasattr(faces, "size") and faces.size == 0):
        from .knn import find_knn
        if neigh_inds is None:
            _, neigh_inds = find_knn(verts, verts, n_neighbors_cloud,
                                     omit_diagonal=True)
        neigh_points = verts[neigh_inds, :] - verts[:, None, :]
        normals = neighborhood_normal(neigh_points)
    else:
        normals = mesh_vertex_normals(verts, faces, face_mask=face_mask)
        # Degenerate-vertex fallback (unreferenced verts / zero-area umbrellas)
        bad = (norm(normals) < 0.5)[:, None] | jnp.isnan(normals).any(
            axis=-1, keepdims=True)
        normals = jnp.where(bad, _fallback_normals(verts), normals)
        normals = normals / (norm(normals) + 1e-20)[:, None]
    return normals


def neighborhood_normal(points):
    """(N,K,3) centered neighborhoods -> (N,3) plane-fit normals via SVD
    (reference geometry.py:92-99)."""
    _, _, vh = jnp.linalg.svd(points, full_matrices=False)
    normal = vh[:, 2, :]
    return normal / (jnp.linalg.norm(normal, axis=-1, keepdims=True) + 1e-20)


def build_tangent_frames(verts, faces=None, normals=None, face_mask=None,
                         neigh_inds=None):
    """Per-vertex orthonormal frame (basisX, basisY, normal), stacked (V,3,3).

    Candidate-axis selection with the 0.9 threshold matches reference
    geometry.py:164-172."""
    V = verts.shape[0]
    dtype = verts.dtype

    if normals is None:
        vert_normals = vertex_normals(verts, faces, face_mask=face_mask,
                                      neigh_inds=neigh_inds)
    else:
        vert_normals = normals

    basis_cand1 = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], dtype=dtype), (V, 3))
    basis_cand2 = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], dtype=dtype), (V, 3))

    basisX = jnp.where(
        (jnp.abs(dot(vert_normals, basis_cand1)) < 0.9)[:, None],
        basis_cand1, basis_cand2)
    basisX = project_to_tangent(basisX, vert_normals)
    basisX = normalize(basisX)
    basisY = cross(vert_normals, basisX)
    return jnp.stack((basisX, basisY, vert_normals), axis=-2)


def edge_tangent_vectors(verts, frames, edges):
    """Project edge vectors into the 2-D tangent basis at the tail vertex.

    edges: (2, E) int; returns (E, 2). Reference geometry.py:197-206."""
    edge_vecs = verts[edges[1, :], :] - verts[edges[0, :], :]
    basisX = frames[edges[0, :], 0, :]
    basisY = frames[edges[0, :], 1, :]
    compX = dot(edge_vecs, basisX)
    compY = dot(edge_vecs, basisY)
    return jnp.stack((compX, compY), axis=-1)
