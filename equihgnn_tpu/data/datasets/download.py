"""Download / archive helpers for dataset raw files (host-side, offline stage).

Replaces the reference's torch.hub / ogb download utilities
(`reference equihgnn/data/qm9.py:16-21`). Skips files that already exist, so
pre-staged raw directories work in zero-egress environments.
"""

from __future__ import annotations

import gzip
import os
import shutil
import tarfile
import urllib.request
import zipfile


def download_url(url: str, output_path: str):
    if os.path.exists(output_path):
        print(f"File already exists at {output_path}, skipping download.")
        return output_path
    print(f"Downloading {url} to {output_path}...")
    os.makedirs(os.path.dirname(output_path), exist_ok=True)
    tmp = output_path + ".part"
    try:
        with urllib.request.urlopen(url) as r, open(tmp, "wb") as f:
            shutil.copyfileobj(r, f)
    except OSError as e:
        raise OSError(
            f"Could not download {url}: {e}. In offline environments, place the "
            f"raw file at {output_path} manually."
        ) from e
    os.replace(tmp, output_path)
    return output_path


def extract_zip(path: str, folder: str):
    with zipfile.ZipFile(path, "r") as z:
        z.extractall(folder)


def extract_tar(path: str, folder: str):
    with tarfile.open(path) as t:
        try:
            t.extractall(folder, filter="data")
        except TypeError:  # filter= needs >= 3.10.12 / 3.11.4
            t.extractall(folder)


def extract_gz(path: str, out_path: str | None = None):
    out_path = out_path or path[: -len(".gz")]
    with gzip.open(path, "rb") as fin, open(out_path, "wb") as fout:
        shutil.copyfileobj(fin, fout)
    return out_path
