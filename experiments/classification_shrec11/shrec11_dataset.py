"""SHREC11 30-class mesh classification datasets.

Mirrors the data layout and split semantics of the reference
(experiments/classification_shrec11/shrec11_dataset.py): the Original NIST .off
variant (categories.txt + raw/T{name}.off) and the Simplified MeshCNN variant
(raw/shrec_16/{class}/{train,test}/*.obj). Splits are random `split_size`
samples per class, regenerated per run, with an exclude_dict to build a disjoint
test set (reference :59-67,:139-147).

Data download (same sources the reference documents):
  Original  — SHREC11 NIST archive (password SHREC11@NIST), unzip to [root]/raw
  Simplified — MeshCNN shrec_16.tar.gz, extract to [root]/raw/
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

import diffusionnet_tpu as dnt
from diffusionnet_tpu.data import SurfaceDataset

SIMPLIFIED_CLASS_NAMES = [
    'alien', 'ants', 'armadillo', 'bird1', 'bird2', 'camel', 'cat', 'centaur',
    'dinosaur', 'dino_ske', 'dog1', 'dog2', 'flamingo', 'glasses', 'gorilla',
    'hand', 'horse', 'lamp', 'laptop', 'man', 'myScissor', 'octopus', 'pliers',
    'rabbit', 'santa', 'shark', 'snake', 'spiders', 'two_balls', 'woman']


def _take_split(candidates, split_size, exclude: set, load_fn, rng=None):
    """Random split_size picks avoiding `exclude` (reference split logic)."""
    order = (np.random if rng is None else rng).permutation(len(candidates))
    chosen = []
    for ind in order:
        if split_size is not None and len(chosen) == split_size:
            break
        name = candidates[ind]
        if name in exclude:
            continue
        chosen.append(name)
    if split_size is not None and len(chosen) < split_size:
        raise ValueError("could not find enough entries to generate requested split")
    return chosen


class Shrec11MeshDataset_Simplified(SurfaceDataset):
    def __init__(self, root_dir, split_size, k_eig, exclude_dict=None,
                 op_cache_dir=None):
        super().__init__(labels_kind="global")
        self.entries = {}
        raw_path = os.path.join(root_dir, "raw", "shrec_16")
        if not os.path.isdir(raw_path):
            raise FileNotFoundError(
                f"SHREC11 simplified data not found at {raw_path}; see the"
                " README in this directory for download instructions")

        for class_idx, class_name in enumerate(SIMPLIFIED_CLASS_NAMES):
            mesh_files = []
            for t in ["test", "train"]:
                d = os.path.join(raw_path, class_name, t)
                for f in sorted(os.listdir(d)):
                    mesh_files.append(os.path.join(d, f))

            exclude = (exclude_dict or {}).get(class_name, set())
            chosen = _take_split(mesh_files, split_size, exclude, None)
            self.entries[class_name] = set(chosen)
            for path in chosen:
                verts, faces = dnt.geometry.read_mesh(path)
                verts = dnt.utils.normalize_positions_np(verts)
                self.add(verts, faces, class_idx)
            print(class_name + " -- "
                  + " ".join(os.path.basename(p) for p in chosen))

        self.precompute(k_eig, op_cache_dir)


class Shrec11MeshDataset_Original(SurfaceDataset):
    def __init__(self, root_dir, split_size, k_eig, exclude_dict=None,
                 op_cache_dir=None):
        super().__init__(labels_kind="global")
        self.entries = {}
        self.class_names = []

        cat_path = os.path.join(root_dir, "categories.txt")
        with open(cat_path) as cat_file:
            cat_file.readline()
            cat_file.readline()
            for i_class in range(30):
                cat_file.readline()
                class_name, _, count = cat_file.readline().strip().split()
                self.class_names.append(class_name)
                mesh_list = [cat_file.readline().strip() for _ in range(20)]

                exclude = (exclude_dict or {}).get(class_name, set())
                chosen = _take_split(mesh_list, split_size, exclude, None)
                self.entries[class_name] = set(chosen)
                for name in chosen:
                    path = os.path.join(root_dir, "raw", f"T{name}.off")
                    verts, faces = dnt.geometry.read_mesh(path)
                    verts = dnt.utils.normalize_positions_np(verts)
                    self.add(verts, faces, i_class)
                print(class_name + " -- " + " ".join(chosen))

        self.precompute(k_eig, op_cache_dir)
