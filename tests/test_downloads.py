"""Dataset download() bodies exercised for real against a local HTTP server.

Round-1 VERDICT §2.4 partial: "download+process never executed against real
raws". Zero-egress forbids the real hosts, so a loopback `http.server`
serves format-correct tiny archives (zip / tar.gz / csv.gz with the exact
member layout of the real raws) and the UNMODIFIED `_download_raw` bodies
fetch, extract, and featurize them end to end:

  * QM9  — qm9.zip {gdb9.sdf, gdb9.sdf.csv} + figshare uncharacterized.txt
           (`reference equihgnn/data/qm9.py:146-163`); the skip list is
           honored by the graph variant only (`qm9.py:297-298`).
  * OPV  — NREL mol_train.csv.gz with molblock + smile + 8 target columns
           (`reference equihgnn/data/opv3d.py:47-143`), polymer filter on
           non-null gap_extrapolated.
  * PCQM — pcqm4m-v2.zip (member pcqm4m-v2/raw/data.csv.gz) + the Stanford
           train-SDF tarball (`reference equihgnn/data/pcqm4.py:16-54`).
  * Molecule3D — a Google-Drive folder page (window['_DRIVE_ivd'] payload)
           listing data.zip, whose members live under data/raw/ exactly as
           the real archive (`reference equihgnn/data/molecule3d.py:88-110`);
           exercises the first-party download_gdrive_folder + the
           reference's extract/move/cleanup choreography.

The first-party SDF/molblock reader stands in for RDKit's suppliers, as in
tests/test_real_molecules.py.
"""

from __future__ import annotations

import gzip
import http.server
import io
import os
import tarfile
import threading
import zipfile

import numpy as np
import pandas as pd
import pytest

from equihgnn_tpu.common.registry import registry
from equihgnn_tpu.data.sdf import parse_sdf_record, read_sdf

pytestmark = pytest.mark.quick

HERE = os.path.dirname(os.path.abspath(__file__))
SDF = os.path.join(HERE, "..", "datasets", "real_sample", "sample.sdf")
N_MOLS = 20  # records in sample.sdf


class _Shim:
    """RDKit-free stand-ins for the supplier slice the datasets use."""

    @staticmethod
    def SDMolSupplier(path, **kw):
        return read_sdf(path)

    @staticmethod
    def MolFromMolBlock(block, **kw):
        return parse_sdf_record(block.split("\n"))


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    """Loopback HTTP server over a directory of raw-archive fixtures."""
    docroot = tmp_path_factory.mktemp("docroot")
    requests: list[str] = []

    class Handler(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=str(docroot), **kw)

        def log_message(self, *a):  # quiet
            requests.append(self.path)

    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield docroot, base, requests
    httpd.shutdown()


def _molblocks():
    with open(SDF) as fh:
        text = fh.read()
    blocks = [b.strip("\n") for b in text.split("$$$$") if b.strip()]
    assert len(blocks) == N_MOLS
    return blocks


def test_qm9_download_bodies(server, tmp_path, monkeypatch):
    import equihgnn_tpu.data.datasets.qm9 as qm9mod

    docroot, base, requests = server
    # qm9.zip: gdb9.sdf + gdb9.sdf.csv at archive top level
    with open(SDF, "rb") as fh:
        sdf_bytes = fh.read()
    csv = pd.DataFrame(
        {n: np.arange(N_MOLS, dtype=np.float32) + k
         for k, n in enumerate(qm9mod.TARGET_NAMES)}
    ).to_csv(index=False)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("gdb9.sdf", sdf_bytes)
        z.writestr("gdb9.sdf.csv", csv)
    (docroot / "qm9.zip").write_bytes(buf.getvalue())
    # figshare skip list: 9 header lines, entries, 2 footer lines
    # (`_skip_set` slices split("\n")[9:-2]); entry "3" skips 0-based index 2
    skip_text = "\n".join(
        ["header"] * 9 + ["   3   gdb 3   extra fields"] + ["footer", "footer"]
    )
    (docroot / "uncharacterized.txt").write_text(skip_text)

    monkeypatch.setattr(qm9mod, "RAW_URL", f"{base}/qm9.zip")
    monkeypatch.setattr(qm9mod, "RAW_URL2", f"{base}/uncharacterized.txt")
    monkeypatch.setattr(qm9mod, "_require_rdkit", lambda: _Shim)

    n0 = len(requests)
    ds = registry.get_data_class("qm9_hg_3d")(root=str(tmp_path / "hg"))
    # hypergraph variant ignores the skip list (reference quirk, qm9.py:297)
    assert len(ds.samples) == N_MOLS
    assert ds.samples[0].pos is not None
    # unit conversion applied
    np.testing.assert_allclose(
        ds.samples[1].y, (np.arange(16) + 1).astype(np.float32) * qm9mod.CONVERSION,
        rtol=1e-6,
    )
    # the zip was actually fetched over HTTP and deleted after extraction
    assert len(requests) - n0 == 2
    assert not os.path.exists(tmp_path / "hg" / "raw" / "qm9.zip")
    assert os.path.exists(tmp_path / "hg" / "raw" / "gdb9.sdf")

    ds_g = registry.get_data_class("qm9_g")(root=str(tmp_path / "g"))
    # graph variant honors the skip list: one molecule dropped
    assert len(ds_g.samples) == N_MOLS - 1
    assert ds_g.samples[0].edge_feat.shape[1] == 1  # 1-dim bond-type feature


def test_opv_download_bodies(server, tmp_path, monkeypatch):
    import equihgnn_tpu.data.datasets.opv as opvmod

    docroot, base, requests = server
    blocks = _molblocks()
    targets = {
        c: np.arange(N_MOLS, dtype=np.float32) + 10 * k
        for k, c in enumerate(opvmod.TARGET_COLUMNS)
    }
    smiles = ["c1ccccc1", "Cc1ccsc1", "C=CC#N", "CC(=O)O"] * (N_MOLS // 4)
    df = pd.DataFrame({"mol": blocks, "smile": smiles, **targets})
    # one row with null gap_extrapolated → excluded from the polymer subset
    df.loc[4, "gap_extrapolated"] = np.nan
    for part in ("train", "valid"):
        with gzip.open(docroot / f"mol_{part}.csv.gz", "wt") as fh:
            df.to_csv(fh, index=False)

    monkeypatch.setattr(
        opvmod, "RAW_URLS",
        {p: f"{base}/mol_{p}.csv.gz" for p in ("train", "valid", "test")},
    )
    monkeypatch.setattr(opvmod, "_require_rdkit", lambda: _Shim)

    ds = registry.get_data_class("opv_hg_3d")(
        root=str(tmp_path), partition="train"
    )
    assert len(ds.samples) == N_MOLS
    assert ds.samples[0].pos is not None and ds.samples[0].pos.shape[1] == 3
    # the gz was downloaded once and extracted to mol_train.csv
    assert os.path.exists(tmp_path / "raw" / "mol_train.csv")

    # polymer train subset drops the NaN gap_extrapolated row
    ds_p = registry.get_data_class("opv_hg_3d")(
        root=str(tmp_path), partition="train", polymer=True
    )
    assert len(ds_p.samples) == N_MOLS - 1

    # valid partition is its own download + cache file
    ds_v = registry.get_data_class("opv_hg_3d")(
        root=str(tmp_path), partition="valid"
    )
    assert len(ds_v.samples) == N_MOLS
    assert ds_v.processed_path != ds.processed_path

    # 2-D variants featurize from the SMILES column, RDKit-free via the
    # first-party parser (data/smiles.py)
    ds_2d = registry.get_data_class("opv_hg")(
        root=str(tmp_path), partition="train"
    )
    assert len(ds_2d.samples) == N_MOLS
    assert ds_2d.samples[0].atom_feat.shape == (6, 9)  # benzene
    ds_2dg = registry.get_data_class("opv_g")(
        root=str(tmp_path), partition="train"
    )
    assert len(ds_2dg.samples) == N_MOLS
    assert ds_2dg.samples[2].edge_feat.shape[0] == 6  # acrylonitrile, 3 bonds×2


def test_pcqm_download_bodies(server, tmp_path, monkeypatch):
    import equihgnn_tpu.data.datasets.pcqm4 as pcqmod

    docroot, base, requests = server
    csv = pd.DataFrame(
        {"smiles": ["C"] * N_MOLS,
         "homolumogap": np.linspace(1.0, 5.0, N_MOLS).astype(np.float32)}
    ).to_csv(index=False)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("pcqm4m-v2/raw/data.csv.gz", gzip.compress(csv.encode()))
    (docroot / "pcqm4m-v2.zip").write_bytes(buf.getvalue())
    tbuf = io.BytesIO()
    with tarfile.open(fileobj=tbuf, mode="w:gz") as t:
        with open(SDF, "rb") as fh:
            data = fh.read()
        info = tarfile.TarInfo("pcqm4m-v2-train.sdf")
        info.size = len(data)
        t.addfile(info, io.BytesIO(data))
    (docroot / "pcqm4m-v2-train.sdf.tar.gz").write_bytes(tbuf.getvalue())

    monkeypatch.setattr(pcqmod, "URL", f"{base}/pcqm4m-v2.zip")
    monkeypatch.setattr(pcqmod, "URL_3D", f"{base}/pcqm4m-v2-train.sdf.tar.gz")
    monkeypatch.setattr(pcqmod, "_require_rdkit", lambda: _Shim)

    ds = registry.get_data_class("pcqm_hg")(root=str(tmp_path))
    assert len(ds.samples) == N_MOLS
    np.testing.assert_allclose(ds.samples[0].y, [1.0])
    assert os.path.exists(tmp_path / "raw" / "data.csv.gz")
    assert not os.path.exists(tmp_path / "pcqm4m-v2.zip")
    # double registration: pcqm_hg_3d resolves to the same class
    assert registry.get_data_class("pcqm_hg_3d") is type(ds)


def test_molecule3d_download_bodies(tmp_path, monkeypatch):
    import json

    import equihgnn_tpu.data.datasets.molecule3d as molmod

    blocks = _molblocks()
    # 4 SDF shards of 5 molecules each (the real archive's member layout
    # under data/raw/), properties.csv with the 7 target columns, split JSONs
    members = {}
    for k, shard in enumerate(molmod.SDF_SHARDS):
        members[shard] = (
            "$$$$\n".join(blocks[5 * k : 5 * (k + 1)]) + "\n$$$$\n"
        )
    members["properties.csv"] = pd.DataFrame(
        {c: np.arange(N_MOLS, dtype=np.float32) + 100 * k
         for k, c in enumerate(molmod.TARGET_COLUMNS)}
    ).to_csv(index=False)
    for name in ("random_split_inds.json", "scaffold_split_inds.json",
                 "random_test_split_inds.json",
                 "scaffold_test_split_inds.json"):
        members[name] = json.dumps(list(range(N_MOLS)))
    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w") as z:
        for name, text in members.items():
            z.writestr(f"data/raw/{name}", text)
        z.writestr("__MACOSX/data/._junk", "")
    zip_bytes = zbuf.getvalue()

    folder_payload = json.dumps(
        [[["zipfile123", None, "data.zip", "application/zip"]]]
    )
    folder_html = (
        "<html><script>window['_DRIVE_ivd'] = '"
        + folder_payload.replace('"', '\\"')
        + "';</script></html>"
    )

    served: list[str] = []

    class Handler(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            served.append(self.path)
            if self.path.startswith(f"/drive/folders/{molmod.GDRIVE_ID}"):
                body, ctype = folder_html.encode(), "text/html"
            elif self.path.startswith("/uc?id=zipfile123"):
                body, ctype = zip_bytes, "application/zip"
            else:
                self.send_error(404)
                return
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        monkeypatch.setenv(
            "EQUIHGNN_GDRIVE_BASE",
            f"http://127.0.0.1:{httpd.server_address[1]}",
        )
        monkeypatch.setattr(molmod, "_require_rdkit", lambda: _Shim)
        ds = registry.get_data_class("molecule_hg_3d")(root=str(tmp_path))
    finally:
        httpd.shutdown()

    assert len(ds.samples) == N_MOLS
    assert ds.samples[0].pos is not None
    np.testing.assert_allclose(
        ds.samples[1].y,
        np.arange(7, dtype=np.float32) * 100 + 1,
        rtol=1e-6,
    )
    # folder page + one file fetch; reference choreography applied:
    # data.zip consumed, raws moved up, data/ and __MACOSX/ removed
    assert [p.split("?")[0] for p in served] == [
        f"/drive/folders/{molmod.GDRIVE_ID}", "/uc",
    ]
    for f in molmod.SDF_SHARDS + ["properties.csv", "random_split_inds.json"]:
        assert os.path.exists(tmp_path / "raw" / f)
    assert not os.path.exists(tmp_path / "raw" / "data.zip")
    assert not os.path.exists(tmp_path / "data")
    assert not os.path.exists(tmp_path / "__MACOSX")
