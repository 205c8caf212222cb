"""One-command dataset setup for the human segmentation (original) suite.

Downloads the Maron et al. 2017 human segmentation benchmark (link published
by the original authors, quoted in the reference README — reference
experiments/human_segmentation_original/README.md:3-4) and unzips it into
data/ so human_segmentation_original_dataset.py finds
data/.../meshes/{train,test}/... and segs/.

Usage: python prepare_data.py [--data_dir DIR]
Exits 0 with a clear SKIPPED message when the environment has no egress.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tools"))
from dataget import check_layout, extract_zip, fetch  # noqa: E402

# reference README.md:3 — dropbox share by the original authors; ?dl=1
# requests the direct file. The shared folder contains
# human_benchmark_sig_17.zip.
DROPBOX_URL = ("https://www.dropbox.com/sh/cnyccu3vtuhq1ii/"
               "AADgGIN6rKbvWzv0Sh-Kr417a?dl=1")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "data"))
    args = ap.parse_args()
    os.makedirs(args.data_dir, exist_ok=True)

    bundle = fetch(DROPBOX_URL, os.path.join(args.data_dir,
                                             "human_seg_share.zip"))
    stage = os.path.join(args.data_dir, "_stage")
    extract_zip(bundle, stage)
    # the share wraps human_benchmark_sig_17.zip; unzip it in place if found
    inner = None
    for dirpath, _, files in os.walk(stage):
        for f in files:
            if f.endswith(".zip") and "human" in f.lower():
                inner = os.path.join(dirpath, f)
    if inner is not None:
        extract_zip(inner, args.data_dir)
    else:  # the share may already BE the benchmark layout
        import shutil
        for entry in os.listdir(stage):
            shutil.move(os.path.join(stage, entry), args.data_dir)
    check_layout(args.data_dir, {"**/meshes/train/**/*.off": 300,
                                 "**/segs/train/**/*.txt": 300,
                                 "**/meshes/test/**/*.off": 18})
    print("Done. Train with: python human_segmentation_original.py")


if __name__ == "__main__":
    main()
