"""Shared helpers for the per-suite prepare_data.py scripts.

Each experiment suite ships a `prepare_data.py` that downloads,
integrity-checks, and lays out the reference datasets exactly as the
reference READMEs prescribe (URLs below are quoted from
/root/reference/experiments/*/README.md). In an environment without network
egress every download exits with status 0 and a clear `SKIPPED (no egress)`
message — nothing is half-written — so the scripts are safe to run
speculatively and become one-command setup the day egress exists.

Integrity: upstream publishes no checksums for these archives, so
verification is structural — archive CRC test on every zip/tar member plus
an expected-layout probe (file-count globs) after extraction. When a
sha256 IS known, pass it to fetch() and it is enforced.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import sys
import tarfile
import urllib.error
import urllib.request
import zipfile


class NoEgress(SystemExit):
    """Raised (exit 0) when the environment cannot reach the network."""

    def __init__(self, url: str, err: Exception):
        print(f"SKIPPED (no egress): could not download {url}\n  ({err})\n"
              "Re-run this script from a machine with network access.")
        super().__init__(0)


def fetch(url: str, dest: str, sha256: str | None = None,
          timeout: float = 30.0) -> str:
    """Download url -> dest (atomic: .part rename). Returns dest.

    Skips the download when dest already exists and passes the checksum.
    Network failures raise NoEgress (exit 0 with a message)."""
    if os.path.exists(dest):
        if sha256 is None or _sha256(dest) == sha256:
            print(f"  already present: {dest}")
            return dest
        print(f"  checksum mismatch on existing {dest}; re-downloading")
        os.remove(dest)
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    tmp = dest + ".part"
    req = urllib.request.Request(url, headers={"User-Agent": "Mozilla/5.0"})
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r, \
                open(tmp, "wb") as f:
            shutil.copyfileobj(r, f)
    except (urllib.error.URLError, OSError, TimeoutError) as e:
        if os.path.exists(tmp):
            os.remove(tmp)
        raise NoEgress(url, e)
    if sha256 is not None:
        got = _sha256(tmp)
        if got != sha256:
            os.remove(tmp)
            raise RuntimeError(f"{url}: sha256 {got} != expected {sha256}")
    os.replace(tmp, dest)
    print(f"  downloaded {dest} ({os.path.getsize(dest)} bytes)")
    return dest


def fetch_gdrive(file_id: str, dest: str, sha256: str | None = None) -> str:
    """Google Drive download, handling the large-file confirm token."""
    base = "https://drive.google.com/uc?export=download"
    url = f"{base}&id={file_id}&confirm=t"
    return fetch(url, dest, sha256=sha256)


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def extract_zip(archive: str, dest: str, password: str | None = None):
    """Extract a zip after a full CRC integrity test of every member."""
    os.makedirs(dest, exist_ok=True)
    pwd = password.encode() if password else None
    with zipfile.ZipFile(archive) as z:
        if pwd:
            z.setpassword(pwd)
        bad = z.testzip()
        if bad is not None:
            raise RuntimeError(f"{archive}: CRC failure on member {bad}")
        z.extractall(dest)
    print(f"  extracted {archive} -> {dest}")


def extract_tar(archive: str, dest: str):
    os.makedirs(dest, exist_ok=True)
    with tarfile.open(archive) as t:
        t.extractall(dest, filter="data")
    print(f"  extracted {archive} -> {dest}")


def clone_github(repo: str, dest: str, branches=("main", "master")):
    """Shallow-clone a public GitHub repo; falls back to the codeload
    tarball when git is unavailable. repo: 'owner/name'."""
    if os.path.isdir(os.path.join(dest, ".git")) or (
            os.path.isdir(dest) and os.listdir(dest)):
        print(f"  already present: {dest}")
        return
    import subprocess
    url = f"https://github.com/{repo}.git"
    try:
        subprocess.run(["git", "clone", "--depth", "1", url, dest],
                       check=True, capture_output=True, timeout=600)
        print(f"  cloned {repo} -> {dest}")
        return
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired,
            FileNotFoundError) as git_err:
        for br in branches:
            tar = dest.rstrip("/") + ".tar.gz"
            try:
                fetch("https://codeload.github.com/"
                      f"{repo}/tar.gz/refs/heads/{br}", tar)
            except NoEgress:
                raise
            except Exception:
                continue
            tmp = dest + ".extract"
            extract_tar(tar, tmp)
            inner = os.path.join(tmp, os.listdir(tmp)[0])
            shutil.move(inner, dest)
            shutil.rmtree(tmp, ignore_errors=True)
            os.remove(tar)
            return
        raise NoEgress(url, git_err)


def check_layout(root: str, globs: dict[str, int]):
    """Verify the extracted layout: for each glob pattern (relative to
    root), at least `count` matches must exist. Prints a summary."""
    import glob as _glob
    ok = True
    for pattern, count in globs.items():
        n = len(_glob.glob(os.path.join(root, pattern), recursive=True))
        status = "ok" if n >= count else "MISSING"
        if n < count:
            ok = False
        print(f"  layout {pattern}: {n} files (need >= {count}) {status}")
    if not ok:
        print("Layout verification FAILED — see the suite README for the "
              "expected structure.")
        sys.exit(1)
    print("Layout OK.")
