"""Native C++ host kernels (ctypes). Built on demand from dnet_native.cpp.

Provides: KD-tree kNN, Dijkstra graph geodesics, fast mesh IO. Python fallbacks
exist for every entry point, so the framework works without the native library;
the native paths accelerate large precompute jobs.
"""

from .build import (  # noqa: F401
    get_lib, knn_native, dijkstra_geodesics_native, steiner_geodesics_native,
    exact_geodesics_native, cloud_triangles_native, csr_spmm_native,
)
