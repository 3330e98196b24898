"""PCQM4Mv2: ~3.7M molecules, single homolumogap target, 3-D train SDF.

Re-design of `reference equihgnn/data/pcqm4.py:16-172`. The hypergraph class
is registered under both `pcqm_hg` and `pcqm_hg_3d` (double-registered in the
reference too — same class, positions always stored); likewise the graph one.
"""

from __future__ import annotations

import os
import os.path as osp

import numpy as np

from equihgnn_tpu.common.registry import registry
from equihgnn_tpu.data.datasets.base import MolDataset
from equihgnn_tpu.data.datasets.download import (
    download_url,
    extract_gz,
    extract_tar,
    extract_zip,
)
from equihgnn_tpu.data.featurize import (
    _require_rdkit,
    mol_to_graph,
    mol_to_hypergraph,
)

URL = "https://dgl-data.s3-accelerate.amazonaws.com/dataset/OGB-LSC/pcqm4m-v2.zip"
URL_3D = "http://ogb-data.stanford.edu/data/lsc/pcqm4m-v2-train.sdf.tar.gz"


class PCQM4Mv2Base(MolDataset):
    num_targets = 1
    has_pos = True

    @property
    def raw_dir(self):
        return osp.join(self.root, "raw")

    def _download_raw(self):
        os.makedirs(self.raw_dir, exist_ok=True)
        csv = osp.join(self.raw_dir, "data.csv.gz")
        sdf = osp.join(self.raw_dir, "pcqm4m-v2-train.sdf")
        if not osp.exists(csv):
            path = download_url(URL, osp.join(self.root, "pcqm4m-v2.zip"))
            extract_zip(path, self.root)
            os.replace(osp.join(self.root, "pcqm4m-v2", "raw", "data.csv.gz"), csv)
            os.unlink(path)
        if not osp.exists(sdf):
            path = download_url(URL_3D, osp.join(self.raw_dir, "train.sdf.tar.gz"))
            extract_tar(path, self.raw_dir)
            os.unlink(path)
        return csv, sdf

    def _iter_mols(self):
        import pandas as pd

        Chem = _require_rdkit()
        csv, sdf = self._download_raw()
        df = pd.read_csv(csv)
        smiles = df["smiles"].values
        gap = df["homolumogap"].values.astype(np.float32)
        suppl = Chem.SDMolSupplier(sdf, removeHs=False, sanitize=False)
        for i, mol in enumerate(suppl):
            if mol is None:
                continue
            yield mol, smiles[i], np.array([gap[i]], dtype=np.float32)


@registry.register_data("pcqm_hg")
@registry.register_data("pcqm_hg_3d")
class PCQM4Mv2HGraph(PCQM4Mv2Base):
    name = "pcqm_hg"
    hyper = True

    def process(self):
        out = []
        for mol, smile, y in self._iter_mols():
            try:
                conf = mol.GetConformer()
                pos = np.asarray(conf.GetPositions(), dtype=np.float32)
                z = np.asarray(
                    [a.GetAtomicNum() for a in mol.GetAtoms()], dtype=np.int32
                )
                s = mol_to_hypergraph(mol, y=y, pos=pos, z=z)
            except Exception as e:
                print(e)
                continue
            out.append(s)
        return out


@registry.register_data("pcqm_g")
@registry.register_data("pcqm_g_3d")
class PCQM4Mv2Graph(PCQM4Mv2Base):
    name = "pcqm_g"
    hyper = False

    def process(self):
        out = []
        for mol, smile, y in self._iter_mols():
            try:
                conf = mol.GetConformer()
                pos = np.asarray(conf.GetPositions(), dtype=np.float32)
                z = np.asarray(
                    [a.GetAtomicNum() for a in mol.GetAtoms()], dtype=np.int32
                )
                s = mol_to_graph(mol, y=y, pos=pos, z=z)
            except Exception as e:
                print(e)
                continue
            out.append(s)
        return out
