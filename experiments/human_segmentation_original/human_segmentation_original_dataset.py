"""Human segmentation dataset of Maron et al. (original, per-FACE labels).

Mirrors the reference's file-layout walk exactly
(experiments/human_segmentation_original/human_segmentation_original_dataset.py):
train = adobe + faust + MIT animation poses + scape; test = shrec meshes 1-20
minus 16,18 with the 12_fix_orientation filename fix; labels are 1-based ints in
txt files (shifted to 0-based here).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

import diffusionnet_tpu as dnt
from diffusionnet_tpu.data import SurfaceDataset


class HumanSegOrigDataset(SurfaceDataset):
    def __init__(self, root_dir, train: bool, k_eig: int = 128,
                 op_cache_dir=None):
        super().__init__(labels_kind="face")
        self.n_class = 8

        if not os.path.isdir(root_dir):
            raise FileNotFoundError(
                f"human segmentation data not found at {root_dir}; see the"
                " README in this directory for download instructions")
        mesh_files, label_files = [], []
        if train:
            for sub, label_name in [("adobe", None), ("faust", "faust_corrected.txt"),
                                    ("scape", "scape_corrected.txt")]:
                mesh_dirpath = os.path.join(root_dir, "meshes", "train", sub)
                label_dirpath = os.path.join(root_dir, "segs", "train", sub)
                for fname in sorted(os.listdir(mesh_dirpath)):
                    mesh_files.append(os.path.join(mesh_dirpath, fname))
                    label_files.append(os.path.join(
                        label_dirpath,
                        label_name if label_name else fname[:-4] + ".txt"))
            # MIT animation poses
            pose_names = ['bouncing', 'handstand', 'march1', 'squat1',
                          'crane', 'jumping', 'march2', 'squat2']
            label_dirpath = os.path.join(root_dir, "segs", "train", "mit")
            for pose in pose_names:
                mesh_dirpath = os.path.join(root_dir, "meshes", "train",
                                            "MIT_animation", f"meshes_{pose}",
                                            "meshes")
                for fname in sorted(os.listdir(mesh_dirpath)):
                    mesh_files.append(os.path.join(mesh_dirpath, fname))
                    label_files.append(os.path.join(
                        label_dirpath, f"mit_{pose}_corrected.txt"))
        else:
            mesh_dirpath = os.path.join(root_dir, "meshes", "test", "shrec")
            label_dirpath = os.path.join(root_dir, "segs", "test", "shrec")
            for iShrec in range(1, 21):
                if iShrec in (16, 18):
                    continue
                mesh_fname = ("12_fix_orientation.off" if iShrec == 12
                              else f"{iShrec}.off")
                mesh_files.append(os.path.join(mesh_dirpath, mesh_fname))
                label_files.append(os.path.join(label_dirpath,
                                                f"shrec_{iShrec}_full.txt"))

        print(f"loading {len(mesh_files)} meshes")
        for mesh_path, label_path in zip(mesh_files, label_files):
            print("loading mesh " + mesh_path)
            verts, faces = dnt.geometry.read_mesh(mesh_path)
            labels = np.loadtxt(label_path).astype(int) - 1
            verts = dnt.utils.normalize_positions_np(verts)
            self.add(verts, faces, labels)

        self.precompute(k_eig, op_cache_dir)
