"""RNA surface segmentation dataset (Poulenard et al., 3DV 2019) — per-VERTEX
labels, 260 classes. Mirrors reference
experiments/rna_mesh_segmentation/rna_mesh_dataset.py: train/test from txt file
lists, labels shifted +1 so the -1 class becomes 0.

Data: https://github.com/nmwsharp/RNA-Surface-Segmentation-Dataset
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

import diffusionnet_tpu as dnt
from diffusionnet_tpu.data import SurfaceDataset


class RNAMeshDataset(SurfaceDataset):
    def __init__(self, root_dir, train: bool, k_eig: int,
                 op_cache_dir=None):
        super().__init__(labels_kind="vertex")
        self.n_class = 260  # (includes -1, shifted to 0)

        split_file = os.path.join(root_dir, "train.txt" if train else "test.txt")
        if not os.path.exists(split_file):
            raise FileNotFoundError(
                f"RNA dataset split list not found at {split_file}; see the"
                " README in this directory for download instructions")
        with open(split_file) as f:
            this_files = [line.rstrip() for line in f]
        print(f"loading {len(this_files)} files: {this_files}")

        off_path = os.path.join(root_dir, "off")
        label_path = os.path.join(root_dir, "labels")
        for f in this_files:
            verts, faces = dnt.geometry.read_mesh(os.path.join(off_path, f))
            labels = np.loadtxt(
                os.path.join(label_path, f[:-4] + ".txt")).astype(int) + 1
            verts = dnt.utils.normalize_positions_np(verts)
            self.add(verts, faces, labels)

        self.precompute(k_eig, op_cache_dir)
