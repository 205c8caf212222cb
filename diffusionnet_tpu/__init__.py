"""diffusionnet_tpu — a TPU-native (JAX/XLA/Pallas) framework for deep learning on
surfaces (triangle meshes and point clouds), with the capabilities of DiffusionNet.

Capability parity target: nmwsharp/diffusion-net (see /root/reference). The reference
exposes one flat namespace via star-imports (reference src/diffusion_net/__init__.py:1-3);
we mirror that convention so `diffusionnet_tpu.get_operators`,
`diffusionnet_tpu.DiffusionNet`, etc. all resolve.

Architecture (TPU-first, not a port):
  * ops/       pure-JAX, jittable device math: vectors, frames, spectral transforms,
               HKS, kNN, FPS, ELL sparse matvec, Pallas kernels.
  * geometry/  host-side float64 precompute: cotan Laplacian, lumped mass, tangent
               frames, gradient operators, eigendecomposition (host ARPACK path and
               TPU LOBPCG path), caching, geodesics.
  * models/    Flax modules: DiffusionNet & friends, functional-maps head.
  * parallel/  jax.sharding Mesh utilities: data-parallel training via shard_map,
               vertex-sharded inference for very large meshes.
  * training/  generic fit()/evaluate() harness, optax schedules, checkpointing.
  * serving/   AOT deployment: the forward exported as portable StableHLO
               artifacts (bucketed static shapes, symbolic batch), loadable
               with jax + numpy only.
  * native/    C++ (ctypes) host kernels: mesh IO, KD-tree kNN, geodesic distances.
"""

from . import utils
from .utils import (
    hash_arrays,
    ensure_dir_exists,
    random_rotate_points,
    random_rotate_points_y,
    random_rotation_matrix,
    label_smoothing_log_loss,
)

from . import ops
from .ops import (
    norm,
    norm2,
    normalize,
    dot,
    cross,
    face_coords,
    face_area,
    face_normals,
    project_to_tangent,
    mesh_vertex_normals,
    vertex_normals,
    build_tangent_frames,
    edge_tangent_vectors,
    to_basis,
    from_basis,
    compute_hks,
    compute_hks_autoscale,
    normalize_positions,
    find_knn,
    farthest_point_sampling,
)

from . import geometry
from .geometry import (
    compute_operators,
    get_operators,
    get_all_operators,
    Operators,
    pad_operators,
    stack_operators,
    geodesic_label_errors,
    get_all_pairs_geodesic_distance,
)

from . import models
from .models import (
    DiffusionNet,
    DiffusionNetBlock,
    LearnedTimeDiffusion,
    SpatialGradientFeatures,
    MiniMLP,
)

from . import parallel
from . import serving
from . import training

__version__ = "0.1.0"
