"""Operator precompute, the typed Operators bundle, disk caching, and padding.

Capability parity with reference geometry.py:276-570 (compute_operators /
get_operators / get_all_operators). TPU-first design (SURVEY §7):

  * the 7-tuple (frames, mass, L, evals, evecs, gradX, gradY) becomes a typed
    pytree `Operators`; sparse operators are stored in ELL layout so applying them
    on device is a static-shape gather + contraction (ops/sparse.py);
  * everything is computed in float64 on host, stored float32 (reference
    geometry.py:429), and padded to bucket sizes for XLA shape stability;
  * the npz disk-cache format is byte-compatible with the reference
    (geometry.py:548-568): SHA1 content hash, linear-probe buckets `{hash}_{i}.npz`,
    k_eig truncation on load, CSC stored as data/indices/indptr/shape. Caches
    written by the PyTorch reference can be consumed directly.

Attribution: the get_operators cache protocol (bucket probing, messages, npz
field layout) transcribes nmwsharp/diffusion-net geometry.py:426-570 for
on-disk byte compatibility — MIT License (c) 2020-2021 Nicholas Sharp and
coauthors; see the repository LICENSE file.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Sequence

import numpy as np
import scipy.sparse

from .. import utils
from ..ops.sparse import Ell, ell_from_coo, ell_pad
from .eigen import eigensolve_host
from .gradients import build_grad, build_grad_point_cloud
from .host_frames import build_tangent_frames_np, edge_tangent_vectors_np
from .laplacian import cotan_laplacian, vertex_areas
from .point_cloud import point_cloud_laplacian


class Operators(NamedTuple):
    """The universal operator bundle (mirrors the reference 7-tuple,
    geometry.py:392). A valid-vertex mask is implicit: mass > 0 (mass is strictly
    positive on real vertices, reference geometry.py:324, zero on padding).

    gradX_spec/gradY_spec are the TPU-native *spectral gradient operators*
    GX = gradX @ evecs, GY = gradY @ evecs, each (V, K). Because spectral
    diffusion produces x_diffuse = evecs @ (e^{-lambda t} (.) x_hat), the
    gradient of the diffused signal reassociates EXACTLY as
        gradX @ x_diffuse = GX @ (e^{-lambda t} (.) x_hat),
    turning the block's sparse gather/SpMM into a dense (V,K)x(K,C) MXU matmul
    with a matmul backward (no scatter-add). The ELL operators remain for the
    implicit_dense path and k_eig=0."""
    frames: np.ndarray   # (V, 3, 3)
    mass: np.ndarray     # (V,)
    L: Ell               # (V, V) weak Laplacian
    evals: np.ndarray    # (K,)
    evecs: np.ndarray    # (V, K)
    gradX: Ell           # (V, V) tangent-gradient real part
    gradY: Ell           # (V, V) tangent-gradient imaginary part
    gradX_spec: np.ndarray | None = None  # (V, K) gradX @ evecs
    gradY_spec: np.ndarray | None = None  # (V, K) gradY @ evecs


def spectral_gradients(gradX, gradY, evecs: np.ndarray):
    """Host computation of GX = gradX @ evecs, GY = gradY @ evecs (see
    Operators docstring). O(V * D * K) — negligible next to the eigensolve.

    gradX/gradY: scipy sparse matrices (fast C SpMM) or Ell bundles."""
    evecs = np.asarray(evecs)

    def apply(op):
        if isinstance(op, Ell):
            gathered = evecs[np.asarray(op.idx)]       # (V, D, K)
            return np.einsum("vd,vdk->vk", np.asarray(op.val), gathered)
        return np.asarray(op @ evecs)

    return (apply(gradX).astype(evecs.dtype),
            apply(gradY).astype(evecs.dtype))


def grad_operators(ops: "Operators", prefer_spectral: bool = True):
    """(gradX, gradY) to feed the model: the dense spectral operators when
    available (fast path, see Operators docstring), else the ELL operators."""
    if prefer_spectral and ops.gradX_spec is not None:
        return ops.gradX_spec, ops.gradY_spec
    return ops.gradX, ops.gradY


def _csc_to_ell(mat: scipy.sparse.spmatrix, dtype=np.float32) -> Ell:
    coo = mat.tocoo()
    return ell_from_coo(coo.row, coo.col, coo.data, mat.shape[0], dtype=dtype)


# The PRIMARY eigensolver (round 3): the TPU-resident Chebyshev-filtered
# subspace iteration. ARPACK ('host') remains as the reference-parity path
# and the automatic fallback when the device solve reports non-convergence.
DEFAULT_EIGENSOLVER = "device"


def compute_operators(verts, faces, k_eig: int, normals=None,
                      dtype=np.float32,
                      eigensolver: str = DEFAULT_EIGENSOLVER,
                      _return_sparse: bool = False,
                      timings: dict | None = None):
    """Build spectral operators for a mesh or point cloud (numpy in / Operators out).

    verts: (V,3); faces: (F,3) int or empty/None for a point cloud; k_eig: number
    of eigenpairs. Same pipeline as reference geometry.py:276-392: tangent frames,
    Laplacian+mass (cotan for meshes, Sharp-Crane-style for clouds), ARPACK-ladder
    eigendecomposition, least-squares tangent gradients over the Laplacian's edge
    set (mesh) or a 30-NN graph (cloud).

    timings: optional dict; when given, per-stage wall seconds are recorded
    into it (keys: frames, laplacian, eigensolve, build_grad,
    spectral_grad, ell_convert) so callers (bench_large) can publish a
    cold-precompute stage breakdown.
    """
    import time as _time
    _t = {"last": _time.perf_counter()}

    def _mark(stage):
        if timings is not None:
            now = _time.perf_counter()
            timings[stage] = timings.get(stage, 0.0) + now - _t["last"]
            _t["last"] = now
        else:
            _t["last"] = _time.perf_counter()

    verts_np = np.asarray(verts, dtype=np.float64)
    faces_np = (np.asarray(faces, dtype=np.int64)
                if faces is not None and np.asarray(faces).size else
                np.zeros((0, 3), dtype=np.int64))
    is_cloud = faces_np.size == 0
    eps = 1e-8

    if normals is not None:
        normals = np.asarray(normals, dtype=np.float64)
    frames = build_tangent_frames_np(verts_np, faces_np if not is_cloud else None,
                                     normals=normals)
    _mark("frames")

    # Laplacian + lumped mass
    if is_cloud:
        L, massvec_np = point_cloud_laplacian(verts_np)
    else:
        L = cotan_laplacian(verts_np, faces_np, denom_eps=1e-10)
        massvec_np = vertex_areas(verts_np, faces_np)
        massvec_np = massvec_np + eps * np.mean(massvec_np)

    if np.isnan(L.data).any():
        raise RuntimeError("NaN Laplace matrix")
    if np.isnan(massvec_np).any():
        raise RuntimeError("NaN mass matrix")
    _mark("laplacian")

    # Eigenbasis: the TPU-resident Chebyshev-filtered subspace iteration is
    # the PRIMARY solver (default) — the heaviest precompute stage runs
    # on-chip. 'host' is the reference-parity ARPACK ladder
    # (geometry.py:336-361) and the automatic fallback if the device solve
    # raises (non-convergence after its own retry), so the eps-ladder
    # failure semantics are always available.
    if k_eig == 0:
        # no basis requested (implicit_dense-only runs): a pure-host result —
        # never touch the accelerator (first device use pays the full TPU
        # client init, ~40 s through this environment's tunnel)
        evals_np = np.zeros((0,))
        evecs_np = np.zeros((verts_np.shape[0], 0))
    elif eigensolver == "host":
        evals_np, evecs_np = eigensolve_host(L, massvec_np, k_eig, eps=eps)
    elif eigensolver == "device":
        import jax.numpy as jnp
        from .eigen import eigensolve_device
        ell = _csc_to_ell(L, dtype=np.float32)
        try:
            # polish: one float64 Rayleigh–Ritz on host within the
            # device-converged basis (we hold the f64 operator anyway) —
            # band error 2e-12 / diffusion parity ~1e-6 vs ARPACK at 20k
            ev, evec = eigensolve_device(
                Ell(jnp.asarray(ell.idx), jnp.asarray(ell.val)),
                jnp.asarray(massvec_np.astype(np.float32)), k_eig, eps=eps,
                polish=(L, massvec_np), timings=timings)
            evals_np = np.asarray(ev, dtype=np.float64)
            evecs_np = np.asarray(evec, dtype=np.float64)
        except RuntimeError as e:
            import warnings
            warnings.warn(f"device eigensolver failed ({e}); falling back "
                          "to the host ARPACK ladder", stacklevel=2)
            evals_np, evecs_np = eigensolve_host(L, massvec_np, k_eig,
                                                 eps=eps)
    else:
        raise ValueError("eigensolver must be 'host' or 'device'")
    _mark("eigensolve")

    # Gradient operator: mesh edges = Laplacian sparsity (reference
    # geometry.py:331-334,375); clouds use a 30-NN graph.
    if is_cloud:
        grad_mat = build_grad_point_cloud(verts_np, frames)
    else:
        L_coo = L.tocoo()
        edges = np.stack((L_coo.row, L_coo.col), axis=0)
        edge_vecs = edge_tangent_vectors_np(verts_np, frames, edges)
        grad_mat = build_grad(verts_np.shape[0], edges, edge_vecs)
    _mark("build_grad")

    # Split the complex gradient into two real sparse mats (reference
    # geometry.py:380-382 does the same for torch's benefit; here it maps onto
    # two real ELL kernels).
    gradX_sp = grad_mat.copy()
    gradX_sp.data = np.real(grad_mat.data)
    gradY_sp = grad_mat.copy()
    gradY_sp.data = np.imag(grad_mat.data)

    gradX_ell = _csc_to_ell(gradX_sp, dtype=dtype)
    gradY_ell = _csc_to_ell(gradY_sp, dtype=dtype)
    L_ell = _csc_to_ell(L, dtype=dtype)
    _mark("ell_convert")
    gX_spec, gY_spec = spectral_gradients(gradX_sp, gradY_sp,
                                          evecs_np.astype(dtype))
    _mark("spectral_grad")
    ops = Operators(
        frames=frames.astype(dtype),
        mass=massvec_np.astype(dtype),
        L=L_ell,
        evals=evals_np.astype(dtype),
        evecs=evecs_np.astype(dtype),
        gradX=gradX_ell,
        gradY=gradY_ell,
        gradX_spec=gX_spec,
        gradY_spec=gY_spec,
    )
    if _return_sparse:
        return ops, (L, gradX_sp, gradY_sp)
    return ops


def _write_cache(search_path, verts_np, faces_np, k_eig, ops, sparse_mats):
    L, gradX_sp, gradY_sp = sparse_mats
    f32 = np.float32
    L_csc = L.tocsc().astype(f32)
    gX = gradX_sp.tocsc().astype(f32)
    gY = gradY_sp.tocsc().astype(f32)
    np.savez(
        search_path,
        verts=verts_np.astype(f32),
        frames=ops.frames.astype(f32),
        faces=faces_np,
        k_eig=k_eig,
        mass=ops.mass.astype(f32),
        L_data=L_csc.data.astype(f32), L_indices=L_csc.indices,
        L_indptr=L_csc.indptr, L_shape=L_csc.shape,
        evals=ops.evals.astype(f32),
        evecs=ops.evecs.astype(f32),
        gradX_data=gX.data.astype(f32), gradX_indices=gX.indices,
        gradX_indptr=gX.indptr, gradX_shape=gX.shape,
        gradY_data=gY.data.astype(f32), gradY_indices=gY.indices,
        gradY_indptr=gY.indptr, gradY_shape=gY.shape,
        # extra keys beyond the reference's set (readers load by name, so
        # byte-level read-compatibility is preserved): the dense spectral
        # gradient operators, so a cache hit skips the O(nnz*K) host SpMM
        gradX_spec=(np.zeros((0, 0), f32) if ops.gradX_spec is None
                    else ops.gradX_spec.astype(f32)),
        gradY_spec=(np.zeros((0, 0), f32) if ops.gradY_spec is None
                    else ops.gradY_spec.astype(f32)),
    )


def _read_sp_mat(npzfile, prefix) -> scipy.sparse.csc_matrix:
    return scipy.sparse.csc_matrix(
        (npzfile[prefix + "_data"], npzfile[prefix + "_indices"],
         npzfile[prefix + "_indptr"]), shape=npzfile[prefix + "_shape"])


def get_operators(verts, faces, k_eig: int = 128, op_cache_dir: str | None = None,
                  normals=None, overwrite_cache: bool = False,
                  dtype=np.float32, eigensolver: str = DEFAULT_EIGENSOLVER,
                  cache_only: bool = False,
                  timings: dict | None = None) -> Operators | None:
    """compute_operators with reference-compatible disk caching
    (geometry.py:426-570): SHA1-of-bytes key, linear probing on collision, exact
    array-equality verification, k_eig truncation on load, race-tolerant writes.

    eigensolver: 'device' (default — TPU-resident Chebyshev-filtered subspace
    iteration, residual-converged; moves the heaviest precompute stage
    on-chip and falls back to 'host' on non-convergence) or 'host' (ARPACK
    shift-invert with the reference's eps ladder). Both produce valid
    mass-orthonormal bases; the disk cache is shared (keyed on geometry
    only), so a cached entry computed by either solver satisfies a request
    for the other."""
    verts_np = np.asarray(verts)
    faces_np = (np.asarray(faces) if faces is not None and np.asarray(faces).size
                else np.zeros((0, 3), dtype=np.int64))
    if np.isnan(verts_np).any():
        raise RuntimeError("tried to construct operators from NaN verts")

    search_path = None
    if op_cache_dir is not None:
        utils.ensure_dir_exists(op_cache_dir)
        # canonical key dtypes (f32 verts / int64 faces): the reference hashes
        # torch-float32 vertex bytes (utils.py:71-76 via toNP of f32 tensors),
        # so this keeps cache keys interoperable regardless of input dtype
        hash_key_str = str(utils.hash_arrays(
            (verts_np.astype(np.float32), faces_np.astype(np.int64))))
        i_cache_search = 0
        while True:
            search_path = os.path.join(
                op_cache_dir, f"{hash_key_str}_{i_cache_search}.npz")
            try:
                npzfile = np.load(search_path, allow_pickle=True)
                cache_verts = npzfile["verts"]
                cache_faces = npzfile["faces"]
                cache_k_eig = npzfile["k_eig"].item()
                if (not np.array_equal(verts_np.astype(np.float32), cache_verts)
                        or not np.array_equal(faces_np, cache_faces)):
                    i_cache_search += 1
                    print("hash collision! searching next.")
                    continue
                if overwrite_cache:
                    os.remove(search_path)
                    break
                if cache_k_eig < k_eig:
                    print("  overwriting cache --- not enough eigenvalues")
                    os.remove(search_path)
                    break
                if "L_data" not in npzfile:
                    print("  overwriting cache --- entries are absent")
                    os.remove(search_path)
                    break

                gradX_sp = _read_sp_mat(npzfile, "gradX")
                gradY_sp = _read_sp_mat(npzfile, "gradY")
                gradX_ell = _csc_to_ell(gradX_sp, dtype=dtype)
                gradY_ell = _csc_to_ell(gradY_sp, dtype=dtype)
                evecs = npzfile["evecs"][:, :k_eig].astype(dtype)
                if ("gradX_spec" in npzfile.files
                        and npzfile["gradX_spec"].size):
                    # cached spectral gradient operators (truncate columns
                    # like evecs — they are linear in the eigenbasis columns)
                    gX_spec = npzfile["gradX_spec"][:, :k_eig].astype(dtype)
                    gY_spec = npzfile["gradY_spec"][:, :k_eig].astype(dtype)
                else:  # entry written by the reference or an older version
                    gX_spec, gY_spec = spectral_gradients(gradX_sp, gradY_sp,
                                                          evecs)
                return Operators(
                    frames=npzfile["frames"].astype(dtype),
                    mass=npzfile["mass"].astype(dtype),
                    L=_csc_to_ell(_read_sp_mat(npzfile, "L"), dtype=dtype),
                    evals=npzfile["evals"][:k_eig].astype(dtype),
                    evecs=evecs,
                    gradX=gradX_ell,
                    gradY=gradY_ell,
                    gradX_spec=gX_spec,
                    gradY_spec=gY_spec,
                )
            except FileNotFoundError:
                break
            except Exception as E:
                print("unexpected error loading file: " + str(E))
                print("-- constructing operators")
                break

    if cache_only:
        # cache-probe mode (parallel precompute loads hits in-process and
        # farms only the misses to worker processes)
        return None

    ops, sparse_mats = compute_operators(verts_np, faces_np, k_eig,
                                         normals=normals, dtype=dtype,
                                         eigensolver=eigensolver,
                                         _return_sparse=True,
                                         timings=timings)
    if search_path is not None:
        import time as _time
        t0 = _time.perf_counter()
        _write_cache(search_path, np.asarray(verts_np, dtype=np.float64),
                     faces_np, k_eig, ops, sparse_mats)
        if timings is not None:
            timings["cache_write"] = _time.perf_counter() - t0
    return ops


def get_all_operators(verts_list, faces_list, k_eig: int,
                      op_cache_dir: str | None = None,
                      normals=None,
                      eigensolver: str = DEFAULT_EIGENSOLVER,
                      n_workers: int | None = None,
                      verbose: bool = True) -> list[Operators]:
    """Batch precompute over a list of shapes (reference geometry.py:395-424).
    Returns a list of Operators (vs the reference's 7 parallel lists).

    n_workers: pipeline width. With the device eigensolver the per-mesh work
    alternates between the chip (filtered sweeps) and the host CPU (assembly
    + band build + f64 Rayleigh-Ritz polish); 2 THREADS overlap mesh i's
    host work with mesh i+1's on-chip sweeps (the GIL is released in both
    device dispatch and BLAS). That only pays when the host has spare cores:
    host-side stages dominate the per-mesh wall at typical sizes, and on a
    single-core host the threads just time-slice the same core (measured at
    50k x 6 meshes on this 1-core environment: 0.96x — neutral). Default:
    2 for 'device' when the host has >= 4 cores, else 1; always 1 for
    'host' — ARPACK is host-bound everywhere. The operator cache is
    race-tolerant by design (reference geometry.py:444-446), so concurrent
    writers — even of identical meshes — at worst duplicate a bucket file."""
    N = len(verts_list)
    if n_workers is None:
        import os
        n_workers = 2 if (eigensolver == "device"
                          and (os.cpu_count() or 1) >= 4) else 1

    def one(i):
        if verbose:
            print(f"get_all_operators() processing {i} / {N} "
                  f"{i / N * 100:.3f}%")
        ni = None if normals is None else normals[i]
        return get_operators(verts_list[i], faces_list[i], k_eig,
                             op_cache_dir, normals=ni,
                             eigensolver=eigensolver)

    if n_workers <= 1 or N <= 1:
        return [one(i) for i in range(N)]
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=n_workers) as ex:
        return list(ex.map(one, range(N)))


# ---------------------------------------------------------------------------
# Padding / batching (TPU static-shape machinery — new capability)
# ---------------------------------------------------------------------------

def pad_operators(ops: Operators, v_pad: int, k_eig: int | None = None,
                  d_max_l: int | None = None, d_max_grad: int | None = None
                  ) -> Operators:
    """Pad an Operators bundle to static shapes.

    Padded vertices have mass == 0 (the implicit validity mask), zero rows in
    evecs/frames, and all-zero ELL rows; padded ELL entries are exact no-ops.
    global_mean outputs are exactly invariant to this padding because they are
    mass-weighted (reference layers.py:393-397).
    """
    V = ops.mass.shape[0]
    if v_pad < V:
        raise ValueError(f"v_pad={v_pad} < V={V}")
    K = ops.evals.shape[0]
    k_eig = k_eig if k_eig is not None else K

    frames = utils.pad_to(ops.frames, v_pad, axis=0)
    mass = utils.pad_to(ops.mass, v_pad, axis=0)
    evals = utils.pad_to(ops.evals, k_eig, axis=0)
    evecs = utils.pad_to(utils.pad_to(ops.evecs, v_pad, axis=0), k_eig, axis=1)
    L = ell_pad(ops.L, v_pad, d_max_l)
    gradX = ell_pad(ops.gradX, v_pad, d_max_grad)
    gradY = ell_pad(ops.gradY, v_pad, d_max_grad)

    def pad_spec(g):
        if g is None:
            return None
        return utils.pad_to(utils.pad_to(g, v_pad, axis=0), k_eig, axis=1)

    return Operators(frames=frames, mass=mass, L=L, evals=evals, evecs=evecs,
                     gradX=gradX, gradY=gradY,
                     gradX_spec=pad_spec(ops.gradX_spec),
                     gradY_spec=pad_spec(ops.gradY_spec))


def stack_operators(ops_list: Sequence[Operators],
                    v_pad: int | None = None,
                    k_eig: int | None = None) -> Operators:
    """Stack a list of Operators into one batched bundle with common padding."""
    import jax
    v_pad = v_pad if v_pad is not None else max(o.mass.shape[0] for o in ops_list)
    k_eig = k_eig if k_eig is not None else min(o.evals.shape[0] for o in ops_list)
    d_l = max(o.L.max_degree for o in ops_list)
    d_g = max(max(o.gradX.max_degree, o.gradY.max_degree) for o in ops_list)
    def trunc(o: Operators) -> Operators:
        return o._replace(
            evals=o.evals[:k_eig], evecs=o.evecs[:, :k_eig],
            gradX_spec=None if o.gradX_spec is None else o.gradX_spec[:, :k_eig],
            gradY_spec=None if o.gradY_spec is None else o.gradY_spec[:, :k_eig])

    padded = [pad_operators(trunc(o), v_pad, k_eig, d_l, d_g) for o in ops_list]
    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *padded)
