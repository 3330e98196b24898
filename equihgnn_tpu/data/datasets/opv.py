"""OPV (NREL organic photovoltaics): ~90k molecules, 8 targets, pre-split.

Re-design of `reference equihgnn/data/opv3d.py:24-455`. Raw CSVs ship the mol
block (3-D) + targets; the polymer subset = rows with non-null
`gap_extrapolated`. Targets 0-3 are molecular, 4-7 polymeric
(`reference equihgnn/utils/data_split.py:14-20`); partitions are the shipped
train/valid/test splits. 2-D variants featurize from SMILES.
"""

from __future__ import annotations

import os
import os.path as osp

import numpy as np

from equihgnn_tpu.common.registry import registry
from equihgnn_tpu.data.datasets.base import MolDataset
from equihgnn_tpu.data.datasets.download import download_url, extract_gz
from equihgnn_tpu.data.featurize import (
    _require_rdkit,
    mol_from_smiles,
    mol_to_graph,
    mol_to_hypergraph,
    smiles_to_hypergraph,
)

RAW_URLS = {
    "train": "https://data.nrel.gov/system/files/236/1712697052-mol_train.csv.gz",
    "valid": "https://data.nrel.gov/system/files/236/1712697052-mol_valid.csv.gz",
    "test": "https://data.nrel.gov/system/files/236/1712697052-mol_test.csv.gz",
}

TARGET_COLUMNS = [
    "gap", "homo", "lumo", "spectral_overlap",
    "homo_extrapolated", "lumo_extrapolated", "gap_extrapolated",
    "optical_lumo_extrapolated",
]


class OPVBase(MolDataset):
    num_targets = 8
    partitioned = True

    def __init__(self, root, partition="train", polymer=False, **kwargs):
        assert partition in ("train", "valid", "test")
        self.polymer = bool(polymer)
        super().__init__(root, partition=partition, polymer=polymer, **kwargs)

    @property
    def raw_dir(self):
        return osp.join(self.root, "raw")

    def _raw_dataframe(self):
        import pandas as pd

        # polymer flag only changes the train partition (reference opv3d.py:120-143)
        part = self.partition
        os.makedirs(self.raw_dir, exist_ok=True)
        csv = osp.join(self.raw_dir, f"mol_{part}.csv")
        if not osp.exists(csv):
            gz = download_url(RAW_URLS[part], csv + ".gz")
            extract_gz(gz, csv)
        df = pd.read_csv(csv)
        if self.polymer and part == "train":
            df = df[~df["gap_extrapolated"].isnull()]
        return df.reset_index(drop=True)

    def _iter(self):
        df = self._raw_dataframe()
        targets = df[TARGET_COLUMNS].values.astype(np.float32)
        yield from zip(df["mol"].values, df["smile"].values, targets)


class _OPV3DBase(OPVBase):
    has_pos = True

    def _mols(self):
        Chem = _require_rdkit()
        for mol_block, smile, y in self._iter():
            mol = Chem.MolFromMolBlock(mol_block, removeHs=False, sanitize=False)
            if mol is None:
                continue
            conf = mol.GetConformer()
            pos = np.asarray(conf.GetPositions(), dtype=np.float32)
            z = np.asarray([a.GetAtomicNum() for a in mol.GetAtoms()], dtype=np.int32)
            yield mol, smile, y, pos, z


@registry.register_data("opv_hg_3d")
class OPVHGraph3D(_OPV3DBase):
    name = "opv_hg_3d"
    hyper = True

    def process(self):
        out = []
        for mol, smile, y, pos, z in self._mols():
            try:
                s = mol_to_hypergraph(mol, y=y, pos=pos, z=z)
            except Exception as e:
                print(e)
                continue
            out.append(s)
        return out


@registry.register_data("opv_g_3d")
class OPVGraph3D(_OPV3DBase):
    name = "opv_g_3d"
    hyper = False

    def process(self):
        out = []
        for mol, smile, y, pos, z in self._mols():
            try:
                s = mol_to_graph(mol, y=y, pos=pos, z=z)
            except Exception as e:
                print(e)
                continue
            out.append(s)
        return out


@registry.register_data("opv_hg")
class OPVHGraph(OPVBase):
    name = "opv_hg"
    hyper = True
    has_pos = False

    def process(self):
        out = []
        for _mol_block, smile, y in self._iter():
            s = smiles_to_hypergraph(smile, y=y)
            if s is not None:
                out.append(s)
        return out


@registry.register_data("opv_g")
class OPVGraph(OPVBase):
    name = "opv_g"
    hyper = False
    has_pos = False

    def process(self):
        out = []
        for _mol_block, smile, y in self._iter():
            mol = mol_from_smiles(smile)
            if mol is None:
                continue
            out.append(mol_to_graph(mol, y=y))
        return out
