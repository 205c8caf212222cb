"""Pure-JAX device ops: the jittable compute vocabulary of the framework."""

from .vector import (
    norm,
    norm2,
    normalize,
    dot,
    cross,
    face_coords,
    face_area,
    face_normals,
    project_to_tangent,
)
from .frames import (
    mesh_vertex_normals,
    neighborhood_normal,
    vertex_normals,
    build_tangent_frames,
    edge_tangent_vectors,
)
from .spectral import (
    to_basis,
    from_basis,
    compute_hks,
    compute_hks_autoscale,
)
from .sparse import Ell, ell_from_coo, ell_matvec, ell_to_dense, ell_pad
from .knn import find_knn, farthest_point_sampling
from .transforms import normalize_positions
from .pallas_fused import fused_spectral_block, fused_spectral_block_batched
