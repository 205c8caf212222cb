"""One-command dataset setup for the RNA mesh segmentation suite.

Clones the published dataset repo into data/ so the meshes land at
data/RNA-Surface-Segmentation-Dataset/off/ — the layout rna_mesh_dataset.py
reads and the reference README prescribes (reference
experiments/rna_mesh_segmentation/README.md:6-10).

Usage: python prepare_data.py [--data_dir DIR]
Exits 0 with a clear SKIPPED message when the environment has no egress.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tools"))
from dataget import check_layout, clone_github  # noqa: E402

REPO = "nmwsharp/RNA-Surface-Segmentation-Dataset"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "data"))
    args = ap.parse_args()
    dest = os.path.join(args.data_dir, "RNA-Surface-Segmentation-Dataset")
    clone_github(REPO, dest)
    check_layout(dest, {"off/*.off": 600, "labels/*.txt": 600,
                        "train.txt": 1, "test.txt": 1})
    print("Done. Train with: python rna_mesh_segmentation.py")


if __name__ == "__main__":
    main()
