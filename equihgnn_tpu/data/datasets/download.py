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


def download_gdrive_folder(
    folder_id: str,
    output_dir: str,
    base_url: str = "https://drive.google.com",
) -> list[str]:
    """First-party `gdown.download_folder` equivalent (gdown is not in this
    image; `reference equihgnn/data/molecule3d.py:92` depends on it).

    Contract it implements (gdown's folder-page parse):
      * ``GET {base}/drive/folders/{id}`` returns HTML embedding
        ``window['_DRIVE_ivd'] = '<escaped JSON>'``; the decoded JSON's first
        element is a list of entries ``[file_id, _, name, mime, ...]``.
      * each file streams from ``{base}/uc?id={fid}&export=download&confirm=t``
        (the confirm flag skips the large-file virus-scan interstitial).

    ``base_url`` is overridable (EQUIHGNN_GDRIVE_BASE) so tests can serve the
    format from a loopback server; Google can change the page format at any
    time, so callers keep a manual-staging fallback.
    """
    import json
    import re
    import urllib.parse

    os.makedirs(output_dir, exist_ok=True)
    url = f"{base_url}/drive/folders/{folder_id}"
    print(f"Listing Google-Drive folder {url}...")
    with urllib.request.urlopen(url) as r:
        html = r.read().decode("utf-8", "replace")
    m = re.search(r"window\['_DRIVE_ivd'\]\s*=\s*'((?:[^'\\]|\\.)*)'", html)
    if m is None:
        raise OSError(
            f"no _DRIVE_ivd payload in folder page {url} — the Drive page "
            f"format changed; stage the raw files manually"
        )
    data = json.loads(m.group(1).encode().decode("unicode_escape"))
    entries = data[0] or []
    paths = []
    for e in entries:
        fid, name = str(e[0]), str(e[2])
        if not name or os.sep in name or name.startswith("."):
            raise OSError(f"suspicious file name in Drive folder: {name!r}")
        file_url = (
            f"{base_url}/uc?id={urllib.parse.quote(fid)}"
            f"&export=download&confirm=t"
        )
        paths.append(download_url(file_url, os.path.join(output_dir, name)))
    return paths


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
