"""FAUST/SCAPE correspondence pair dataset (reference
experiments/functional_correspondence/faust_scape_dataset.py).

Loads all shapes of the chosen dataset (off_2 meshes + corres .vts 1-based
template correspondences), area-normalizes, precomputes operators and HKS, and
exposes train pairs = permutations of the first 80 (faust) / 51 (scape) shapes,
test pairs = combinations of the held-out 20 (reference :35-39). The
ground-truth functional map C_gt is the least-squares alignment of the paired
eigenvector samples (reference :186-191).
"""

from __future__ import annotations

import os
import sys
from itertools import combinations, permutations

import numpy as np

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

import diffusionnet_tpu as dnt
from diffusionnet_tpu.geometry import get_operators


class FaustScapeDataset:
    def __init__(self, root_dir, name="faust", train=True, k_eig=128,
                 n_fmap=30, op_cache_dir=None, n_train=None, n_test=20):
        """n_train/n_test default to the reference splits (80/51 train, 20
        held-out test, reference faust_scape_dataset.py:35-39); overridable for
        smoke tests on fabricated data."""
        self.train = train
        self.k_eig = k_eig
        self.n_fmap = n_fmap
        self.name = name

        self.verts_list, self.faces_list = [], []
        self.vts_list, self.names_list, self.ops_list = [], [], []

        if n_train is None:
            n_train = {"faust": 80, "scape": 51}[name]
        if train:
            self.combinations = list(permutations(range(n_train), 2))
        else:
            self.combinations = list(
                combinations(range(n_train, n_train + n_test), 2))

        mesh_dirpath = os.path.join(root_dir, name, "off_2")
        if not os.path.isdir(mesh_dirpath):
            raise FileNotFoundError(
                f"{name} meshes not found at {mesh_dirpath}; see the README"
                " in this directory for download instructions")
        vts_dirpath = os.path.join(root_dir, name, "corres")
        # derive each .vts path FROM the mesh filename — zipping two
        # independently sorted listings silently misaligns every pair after
        # any stray file (.DS_Store, README) or a single missing .vts
        mesh_files = sorted(
            os.path.join(mesh_dirpath, f) for f in os.listdir(mesh_dirpath)
            if f.lower().endswith((".off", ".obj", ".ply")))
        vts_files = [os.path.join(vts_dirpath,
                                  os.path.splitext(os.path.basename(m))[0]
                                  + ".vts")
                     for m in mesh_files]
        missing = [v for v in vts_files if not os.path.exists(v)]
        if missing:
            raise FileNotFoundError(
                f"correspondence files missing for {len(missing)} meshes, "
                f"e.g. {missing[0]}")

        print(f"loading {len(mesh_files)} meshes")
        for mesh_path, vts_path in zip(mesh_files, vts_files):
            verts, faces = dnt.geometry.read_mesh(mesh_path)
            vts = np.loadtxt(vts_path).astype(int) - 1  # 1-based -> 0-based
            verts = dnt.utils.normalize_positions_np(verts, faces=faces,
                                                     scale_method="area")
            self.verts_list.append(verts.astype(np.float32))
            self.faces_list.append(faces)
            self.vts_list.append(vts)
            self.names_list.append(os.path.basename(mesh_path).split(".")[0])
            self.ops_list.append(get_operators(verts, faces, k_eig=k_eig,
                                               op_cache_dir=op_cache_dir))

    def __len__(self):
        return len(self.combinations)

    def gt_fmap(self, idx1: int, idx2: int) -> np.ndarray:
        """C_gt: least-squares map aligning evecs at corresponding template
        samples (reference faust_scape_dataset.py:186-191). Cached per pair —
        the identical float64 lstsq would otherwise be re-solved for every
        pair on every epoch (6320 solves/epoch at FAUST scale)."""
        cache = getattr(self, "_fmap_cache", None)
        if cache is None:
            cache = self._fmap_cache = {}
        if (idx1, idx2) not in cache:
            k = self.n_fmap
            e1 = self.ops_list[idx1].evecs[:, :k][self.vts_list[idx1]]
            e2 = self.ops_list[idx2].evecs[:, :k][self.vts_list[idx2]]
            sol, *_ = np.linalg.lstsq(e1.astype(np.float64),
                                      e2.astype(np.float64), rcond=None)
            cache[(idx1, idx2)] = sol.T.astype(np.float32)  # (k, k)
        return cache[(idx1, idx2)]

    def __getitem__(self, idx):
        idx1, idx2 = self.combinations[idx]
        return idx1, idx2, self.gt_fmap(idx1, idx2)
