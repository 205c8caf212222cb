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
from .banded import (Banded, banded_from_sparse, banded_from_sparse_device,
                     banded_matvec, dia_from_sparse, dia_matvec,
                     rcm_permutation)
from .blocked_ell import (BlockedEll, blocked_ell_from_sparse,
                          blocked_ell_matvec, blocked_ell_matvec_ref)
from .knn import find_knn, farthest_point_sampling
from .transforms import normalize_positions
from .pallas_fused import fused_spectral_block, fused_spectral_block_batched
