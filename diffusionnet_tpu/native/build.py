"""Build + ctypes bindings for the native host kernels.

Compiles dnet_native.cpp with g++ on first use (a few seconds, cached as
libdnet_native.so next to the source). All callers have pure-Python fallbacks,
so a missing compiler degrades gracefully.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "dnet_native.cpp")
_SRC_ICH = os.path.join(_HERE, "ich_geodesics.cpp")
_SO = os.path.join(_HERE, "libdnet_native.so")

_lib = None
_lock = threading.Lock()


def get_lib() -> ctypes.CDLL:
    """Compile (if needed) and load the native library."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC_ICH)):
            # compile to a per-process temp path and os.rename (atomic on
            # POSIX): two processes racing a first-use compile must never
            # dlopen a partially written .so
            tmp_so = f"{_SO}.{os.getpid()}.tmp"
            cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                   "-std=c++17", "-pthread", _SRC, _SRC_ICH, "-o", tmp_so]
            try:
                try:
                    subprocess.run(cmd, check=True, capture_output=True)
                except subprocess.CalledProcessError:
                    # some toolchains reject -march=native (cross/sandboxed)
                    cmd.remove("-march=native")
                    try:
                        subprocess.run(cmd, check=True, capture_output=True)
                    except subprocess.CalledProcessError as e:
                        raise RuntimeError(
                            "native build failed:\n"
                            + e.stderr.decode(errors="replace")) from None
                os.replace(tmp_so, _SO)
            finally:
                if os.path.exists(tmp_so):
                    os.remove(tmp_so)
        lib = ctypes.CDLL(_SO)

        lib.dnet_knn.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.dnet_knn.restype = None

        lib.dnet_dijkstra_geodesics.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.dnet_dijkstra_geodesics.restype = None

        lib.dnet_steiner_geodesics.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.dnet_steiner_geodesics.restype = None

        lib.dnet_cloud_triangles.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ]
        lib.dnet_cloud_triangles.restype = ctypes.c_int64

        lib.dnet_csr_spmm_f64.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int32,
        ]
        lib.dnet_csr_spmm_f64.restype = None

        lib.dnet_ich_geodesics.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.dnet_ich_geodesics.restype = ctypes.c_int32

        _lib = lib
        return _lib


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def _check_faces(faces: np.ndarray, n_verts: int, what: str = "faces"):
    """Python-level bounds validation: the C++ kernels index raw buffers, so
    an out-of-range index from a corrupted file/cache would be silent memory
    corruption instead of an exception."""
    if faces.size and (faces.min() < 0 or faces.max() >= n_verts):
        raise ValueError(f"{what} index out of range [0, {n_verts}): "
                         f"got {faces.min()}..{faces.max()}")


def csr_spmm_native(A, B: np.ndarray, n_threads: int = 0) -> np.ndarray:
    """out = A @ B with A a scipy CSR (V, V) and B a dense (V, C) float64 —
    the threaded/vectorized replacement for scipy's slow csr-multivector
    product (see dnet_csr_spmm_f64). n_threads=0: hardware concurrency."""
    lib = get_lib()
    if A.shape[0] != A.shape[1] or A.shape[1] != B.shape[0]:
        raise ValueError(f"shape mismatch: A {A.shape} @ B {B.shape}")
    if A.format != "csr":  # a CSC here would silently compute A.T @ B
        A = A.tocsr()
    indptr = np.ascontiguousarray(A.indptr, dtype=np.int64)
    indices = np.ascontiguousarray(A.indices, dtype=np.int64)
    data = np.ascontiguousarray(A.data, dtype=np.float64)
    B = np.ascontiguousarray(B, dtype=np.float64)
    out = np.empty((A.shape[0], B.shape[1]), dtype=np.float64)
    lib.dnet_csr_spmm_f64(
        _ptr(indptr, ctypes.c_int64), _ptr(indices, ctypes.c_int64),
        _ptr(data, ctypes.c_double), _ptr(B, ctypes.c_double),
        A.shape[0], B.shape[1], _ptr(out, ctypes.c_double), n_threads)
    return out


def knn_native(points_target: np.ndarray, points_source: np.ndarray, k: int):
    """KD-tree kNN: returns (dists (N,k) float64, inds (N,k) int64), sorted."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    lib = get_lib()
    tgt = np.ascontiguousarray(points_target, dtype=np.float64)
    src = np.ascontiguousarray(points_source, dtype=np.float64)
    n_t, n_s = tgt.shape[0], src.shape[0]
    k = min(k, n_t)
    dists = np.empty((n_s, k), dtype=np.float64)
    inds = np.empty((n_s, k), dtype=np.int64)
    lib.dnet_knn(_ptr(tgt, ctypes.c_double), n_t, _ptr(src, ctypes.c_double),
                 n_s, k, _ptr(dists, ctypes.c_double), _ptr(inds, ctypes.c_int64))
    return dists, inds


def cloud_triangles_native(verts: np.ndarray, k: int = 30) -> np.ndarray:
    """Point-cloud triangle soup: union of per-point tangent-plane Delaunay
    triangles incident to each point (threaded C++). Returns (T, 3) int64
    canonicalized unique triangles."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    lib = get_lib()
    verts = np.ascontiguousarray(verts, dtype=np.float64)
    V = verts.shape[0]
    max_tris = max(64, 24 * V)
    for _ in range(3):
        out = np.empty((max_tris, 3), dtype=np.int64)
        n = lib.dnet_cloud_triangles(
            _ptr(verts, ctypes.c_double), V, int(k),
            _ptr(out, ctypes.c_int64), max_tris)
        if n >= 0:
            return out[:n].copy()
        max_tris *= 4
    raise RuntimeError("cloud triangulation overflow")


def dijkstra_geodesics_native(verts: np.ndarray, faces: np.ndarray,
                              sources: np.ndarray) -> np.ndarray:
    """Graph (edge-path) geodesic distances: (S, V) float32."""
    lib = get_lib()
    verts = np.ascontiguousarray(verts, dtype=np.float64)
    faces = np.ascontiguousarray(faces, dtype=np.int64)
    sources = np.ascontiguousarray(sources, dtype=np.int64)
    _check_faces(faces, verts.shape[0])
    _check_faces(sources, verts.shape[0], "sources")
    out = np.empty((sources.shape[0], verts.shape[0]), dtype=np.float32)
    lib.dnet_dijkstra_geodesics(
        _ptr(verts, ctypes.c_double), verts.shape[0],
        _ptr(faces, ctypes.c_int64), faces.shape[0],
        _ptr(sources, ctypes.c_int64), sources.shape[0],
        _ptr(out, ctypes.c_float))
    return out


def steiner_geodesics_native(verts: np.ndarray, faces: np.ndarray,
                             sources: np.ndarray,
                             k_steiner: int = 4) -> np.ndarray:
    """Steiner-refined graph geodesics: (S, V) float32; error ~ O(1/k_steiner)
    to the true polyhedral geodesic."""
    lib = get_lib()
    verts = np.ascontiguousarray(verts, dtype=np.float64)
    faces = np.ascontiguousarray(faces, dtype=np.int64)
    sources = np.ascontiguousarray(sources, dtype=np.int64)
    _check_faces(faces, verts.shape[0])
    _check_faces(sources, verts.shape[0], "sources")
    out = np.empty((sources.shape[0], verts.shape[0]), dtype=np.float32)
    lib.dnet_steiner_geodesics(
        _ptr(verts, ctypes.c_double), verts.shape[0],
        _ptr(faces, ctypes.c_int64), faces.shape[0],
        _ptr(sources, ctypes.c_int64), sources.shape[0],
        k_steiner, _ptr(out, ctypes.c_float))
    return out


def exact_geodesics_native(verts: np.ndarray, faces: np.ndarray,
                           sources: np.ndarray,
                           window_budget: int | None = None,
                           patch_failures: bool = False) -> np.ndarray:
    """Exact polyhedral geodesics (ICH continuous Dijkstra): (S, V) float32.

    With patch_failures=True, sources whose window budget overflowed are
    recomputed with Steiner-refined graph distances (only those rows), so one
    pathological source cannot discard an otherwise-exact result. Raises
    RuntimeError when the mesh is non-manifold/non-oriented, or on budget
    overflow when patch_failures=False."""
    lib = get_lib()
    verts = np.ascontiguousarray(verts, dtype=np.float64)
    faces = np.ascontiguousarray(faces, dtype=np.int64)
    sources = np.ascontiguousarray(sources, dtype=np.int64)
    _check_faces(faces, verts.shape[0])
    _check_faces(sources, verts.shape[0], "sources")
    if window_budget is None:
        window_budget = max(200 * faces.shape[0], 2_000_000)
    out = np.empty((sources.shape[0], verts.shape[0]), dtype=np.float32)
    ok = np.empty(sources.shape[0], dtype=np.int32)
    rc = lib.dnet_ich_geodesics(
        _ptr(verts, ctypes.c_double), verts.shape[0],
        _ptr(faces, ctypes.c_int64), faces.shape[0],
        _ptr(sources, ctypes.c_int64), sources.shape[0],
        window_budget, _ptr(out, ctypes.c_float), _ptr(ok, ctypes.c_int32))
    if rc == 1:
        return out
    if rc < 0:
        raise RuntimeError("exact geodesics failed (non-manifold or "
                           "non-oriented mesh)")
    if not patch_failures:
        raise RuntimeError("exact geodesics failed (window budget exceeded "
                           f"for {int((ok == 0).sum())}/{len(ok)} sources)")
    bad = np.flatnonzero(ok == 0)
    out[bad] = steiner_geodesics_native(verts, faces, sources[bad],
                                        k_steiner=8)
    return out
