"""One-command dataset setup for the functional correspondence suite.

Downloads the remeshed FAUST_r / SCAPE_r archives published by the
GeomFMaps authors (links quoted in the reference README — reference
experiments/functional_correspondence/README.md:9-29) and lays them out as
faust_scape_dataset.py expects:

  data/faust/off_2/*.off     data/faust/corres/*.vts
  data/scape/off_2/*.off     data/scape/corres/*.vts

Note the citation and license restrictions of the original data (FAUST:
faust.is.tue.mpg.de, SCAPE: ai.stanford.edu/~drago/Projects/scape/).

Usage: python prepare_data.py [--data_dir DIR] [--dataset faust|scape|both]
Exits 0 with a clear SKIPPED message when the environment has no egress.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tools"))
from dataget import check_layout, extract_zip, fetch  # noqa: E402

# reference README.md:9 — nextcloud share by the GeomFMaps authors.
# The share's direct-download URL pattern: /s/<token>/download?files=<name>
SHARE = "https://nuage.lix.polytechnique.fr/index.php/s/LJFXrsTG22wYCXx"
FILES = {
    "faust": ["FAUST_r.zip", "FAUST_r_vts.zip"],
    "scape": ["SCAPE_r.zip", "SCAPE_r_vts.zip"],
}
COUNTS = {"faust": 100, "scape": 71}


def prepare(name: str, data_dir: str):
    dest_root = os.path.join(data_dir, name)
    for fname in FILES[name]:
        url = f"{SHARE}/download?path=%2F&files={fname}"
        archive = fetch(url, os.path.join(data_dir, fname))
        extract_zip(archive, dest_root)
    # archives may extract as FAUST_r/off_2 — flatten one wrapper level
    for wrapper in (f"{name.upper()}_r", f"{name.upper()}_r_vts"):
        w = os.path.join(dest_root, wrapper)
        if os.path.isdir(w):
            import shutil
            for entry in os.listdir(w):
                shutil.move(os.path.join(w, entry), dest_root)
            os.rmdir(w)
    n = COUNTS[name]
    check_layout(dest_root, {"off_2/*.off": n, "corres/*.vts": n})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "data"))
    ap.add_argument("--dataset", default="both",
                    choices=["faust", "scape", "both"])
    args = ap.parse_args()
    for name in (["faust", "scape"] if args.dataset == "both"
                 else [args.dataset]):
        prepare(name, args.data_dir)
    print("Done. Train with: python functional_correspondence.py "
          "--train_dataset faust")


if __name__ == "__main__":
    main()
