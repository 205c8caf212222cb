"""One-command dataset setup for the SHREC11 classification suite.

Lays out both variants exactly as shrec11_dataset.py expects (and as the
reference README prescribes, reference
experiments/classification_shrec11/README.md:9-19):

  data/original/categories.txt           (ships with this repo)
  data/original/raw/T{n}.off             (NIST archive, password-protected)
  data/simplified/raw/shrec_16/{class}/{train,test}/*.obj  (MeshCNN copy)

Usage: python prepare_data.py [--data_dir DIR] [--variant original|simplified|both]
Exits 0 with a clear SKIPPED message when the environment has no egress.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tools"))
from dataget import check_layout, extract_tar, extract_zip, fetch, \
    fetch_gdrive  # noqa: E402

# reference README.md:9 — zip of the lost NIST dataset page
GDRIVE_ID = "1O_P03aAxhjCOKQH2n71j013-EfSmEp5e"
NIST_INNER_ZIP = "NonRigid/SHREC11_test_database_new.zip"
NIST_PASSWORD = "SHREC11@NIST"
# reference README.md:16 — MeshCNN simplified models (link from the authors)
MESHCNN_URL = "https://www.dropbox.com/s/w16st84r6wc57u7/shrec_16.tar.gz?dl=1"


def prepare_original(data_dir: str):
    root = os.path.join(data_dir, "original")
    os.makedirs(root, exist_ok=True)
    cats = os.path.join(root, "categories.txt")
    if not os.path.exists(cats):
        shipped = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "categories.txt")
        if os.path.exists(shipped):
            import shutil
            shutil.copy(shipped, cats)
            print(f"  placed {cats}")
        else:
            print("  WARNING: categories.txt not found — ground-truth labels "
                  "come from the reference repository's "
                  "data/original/categories.txt")
    outer = fetch_gdrive(GDRIVE_ID, os.path.join(data_dir,
                                                 "SHREC2011_NonRigid.zip"))
    stage = os.path.join(data_dir, "_nist_stage")
    extract_zip(outer, stage)
    inner = os.path.join(stage, NIST_INNER_ZIP)
    if not os.path.exists(inner):
        # layout drift inside the archive: search for it
        for dirpath, _, files in os.walk(stage):
            for f in files:
                if f == os.path.basename(NIST_INNER_ZIP):
                    inner = os.path.join(dirpath, f)
    extract_zip(inner, os.path.join(root, "raw"), password=NIST_PASSWORD)
    check_layout(root, {"categories.txt": 1, "raw/**/*.off": 600})


def prepare_simplified(data_dir: str):
    root = os.path.join(data_dir, "simplified")
    tar = fetch(MESHCNN_URL, os.path.join(data_dir, "shrec_16.tar.gz"))
    extract_tar(tar, os.path.join(root, "raw"))
    check_layout(root, {"raw/shrec_16/*/train/*.obj": 480,
                        "raw/shrec_16/*/test/*.obj": 120})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "data"))
    ap.add_argument("--variant", default="both",
                    choices=["original", "simplified", "both"])
    args = ap.parse_args()
    if args.variant in ("original", "both"):
        prepare_original(args.data_dir)
    if args.variant in ("simplified", "both"):
        prepare_simplified(args.data_dir)
    print("Done. Train with: python classification_shrec11.py "
          f"--dataset_type {args.variant if args.variant != 'both' else 'original'}")


if __name__ == "__main__":
    main()
