"""FAUST with discretization-robustness test splits (reference
experiments/sampling_invariance/faust_with_robust_test_dataset.py).

Train: 80 FAUST template registrations (labels = identity vertex indices).
Test: 5 remeshings + 1 point-cloud sampling of meshes 80-99 from
https://github.com/nmwsharp/discretization-robust-correspondence-benchmark —
mutations {orig, iso, qes, mc, dense, cloud}. The cloud split reads per-vertex
normals from the ply and passes them into operator precompute (the only use of
the normals= override in the reference, :107-115,:146).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

import diffusionnet_tpu as dnt
from diffusionnet_tpu.data import SurfaceDataset
from diffusionnet_tpu.geometry import read_ply


class FaustWithRobustTestDataset(SurfaceDataset):
    def __init__(self, root_dir, train: bool, k_eig: int = 128,
                 op_cache_dir=None, n_train: int = 80, n_test: int = 20):
        """n_train/n_test default to the reference split (meshes 0-79 train,
        80-99 per-mutation test, reference :44,:85); overridable for smoke
        tests on fabricated data."""
        super().__init__(labels_kind="vertex")
        self.n_class = 6890
        self.mut_list = []
        normals_list = []

        if not os.path.isdir(root_dir):
            raise FileNotFoundError(
                f"FAUST robust-benchmark data not found at {root_dir}; see"
                " the README in this directory for download instructions")
        train_dirpath = os.path.join(root_dir, "train", "MPI-FAUST",
                                     "training", "registrations")
        test_dirpath = os.path.join(root_dir, "test", "data")

        if train:
            for i in range(n_train):
                path = os.path.join(train_dirpath, f"tr_reg_{i:03d}.ply")
                verts, faces = dnt.geometry.read_mesh(path)
                verts = dnt.utils.normalize_positions_np(verts, method="bbox")
                self.add(verts, faces, np.arange(verts.shape[0]))
                self.mut_list.append(None)
                normals_list.append(None)
            print(f"loaded {len(self)} train meshes")
        else:
            methods = ["orig", "iso", "qes", "mc", "dense", "cloud"]
            for method in methods:
                for i in range(n_train, n_train + n_test):
                    normals = None
                    if method == "orig":
                        path = os.path.join(train_dirpath, f"tr_reg_{i:03d}.ply")
                        verts, faces = dnt.geometry.read_mesh(path)
                        labels = np.arange(verts.shape[0])
                    elif method == "cloud":
                        path = os.path.join(
                            test_dirpath, method, f"tr_reg_{method}_{i:03d}.ply")
                        verts, _, props = read_ply(path)
                        faces = np.zeros((0, 3), np.int64)
                        normals = np.stack([props["nx"], props["ny"],
                                            props["nz"]], axis=-1)
                        labels = np.loadtxt(os.path.join(
                            test_dirpath, method,
                            f"tr_reg_{method}_{i:03d}.txt"), dtype=np.int64)
                    else:
                        path = os.path.join(
                            test_dirpath, method, f"tr_reg_{method}_{i:03d}.ply")
                        verts, faces = dnt.geometry.read_mesh(path)
                        labels = np.loadtxt(os.path.join(
                            test_dirpath, method,
                            f"tr_reg_{method}_{i:03d}.txt"), dtype=np.int64)

                    verts = dnt.utils.normalize_positions_np(verts,
                                                             method="bbox")
                    self.add(verts, faces, labels)
                    self.mut_list.append(method)
                    normals_list.append(normals)
            print(f"loaded {len(self)} test meshes/clouds")

        self.precompute(k_eig, op_cache_dir, normals_list=normals_list)
