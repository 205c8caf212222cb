"""One-command dataset setup for the sampling (discretization) invariance
suite.

Test data: the discretization-robust correspondence benchmark repo is
public — cloned into data/test/ (reference
experiments/sampling_invariance/README.md:11-21).

Train data: MPI-FAUST requires per-user registration at
faust.is.tue.mpg.de, so it cannot be auto-downloaded; this script verifies
an MPI-FAUST.zip you place next to it (or an already-extracted tree) and
lays it out as faust_with_robust_test_dataset.py expects:

  data/train/MPI-FAUST/training/registrations/tr_reg_000.ply ...
  data/test/data/iso/tr_reg_iso_080.ply ...

Usage: python prepare_data.py [--data_dir DIR] [--faust_zip MPI-FAUST.zip]
Exits 0 with a clear SKIPPED message when the environment has no egress.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tools"))
from dataget import check_layout, clone_github, extract_zip  # noqa: E402

TEST_REPO = "nmwsharp/discretization-robust-correspondence-benchmark"


def main():
    ap = argparse.ArgumentParser()
    base = os.path.dirname(os.path.abspath(__file__))
    ap.add_argument("--data_dir", default=os.path.join(base, "data"))
    ap.add_argument("--faust_zip", default=os.path.join(base,
                                                        "MPI-FAUST.zip"))
    args = ap.parse_args()

    clone_github(TEST_REPO, os.path.join(args.data_dir, "test"))
    check_layout(os.path.join(args.data_dir, "test"),
                 {"data/iso/*.ply": 20, "data/cloud/*.ply": 20})

    train_root = os.path.join(args.data_dir, "train")
    reg = os.path.join(train_root, "MPI-FAUST", "training", "registrations")
    if os.path.isdir(reg) and len(os.listdir(reg)) >= 100:
        print(f"  train data already present: {reg}")
    elif os.path.exists(args.faust_zip):
        extract_zip(args.faust_zip, train_root)
        check_layout(train_root,
                     {"MPI-FAUST/training/registrations/tr_reg_*.ply": 100})
    else:
        print("MPI-FAUST requires registration at http://faust.is.tue.mpg.de"
              " — download MPI-FAUST.zip there, place it at "
              f"{args.faust_zip}, and re-run this script.")
        return
    print("Done. Train with: python sampling_invariance.py")


if __name__ == "__main__":
    main()
