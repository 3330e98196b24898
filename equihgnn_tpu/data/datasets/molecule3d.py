"""Molecule3D: ~3.9M molecules with DFT geometries, 7 targets.

Re-design of `reference equihgnn/data/molecule3d.py:16-260`. Raw data is a
Google-Drive folder (4 combined SDF shards + properties.csv + split-index
JSONs); downloading requires `gdown`, which this environment does not have —
stage the raw files manually in offline setups. SDF parsing uses
sanitize=True (reference `molecule3d.py:141,205`).
"""

from __future__ import annotations

import os.path as osp

import numpy as np

from equihgnn_tpu.common.registry import registry
from equihgnn_tpu.data.datasets.base import MolDataset
from equihgnn_tpu.data.featurize import (
    _require_rdkit,
    mol_to_graph,
    mol_to_hypergraph,
)

TARGET_COLUMNS = [
    "dipole x", "dipole y", "dipole z", "homo", "lumo", "homolumogap",
    "scf energy",
]

GDRIVE_ID = "1y-EyoDYMvWZwClc2uvXrM4_hQBtM85BI"

SDF_SHARDS = [
    "combined_mols_0_to_1000000.sdf",
    "combined_mols_1000000_to_2000000.sdf",
    "combined_mols_2000000_to_3000000.sdf",
    "combined_mols_3000000_to_3899647.sdf",
]


class MoleculeBase(MolDataset):
    num_targets = 7
    has_pos = True

    @property
    def raw_dir(self):
        return osp.join(self.root, "raw")

    def _download_raw(self):
        missing = [
            f for f in SDF_SHARDS + ["properties.csv"]
            if not osp.exists(osp.join(self.raw_dir, f))
        ]
        if not missing:
            return
        try:
            import gdown  # pragma: no cover - optional dependency
        except ImportError as e:
            raise ImportError(
                f"Molecule3D raw files missing ({missing[:2]}...) and gdown is "
                f"not installed. Download the Google-Drive folder id "
                f"{GDRIVE_ID} manually into {self.raw_dir}."
            ) from e
        gdown.download_folder(id=GDRIVE_ID, output=self.raw_dir)

    def _iter_mols(self):
        import pandas as pd

        Chem = _require_rdkit()
        self._download_raw()
        df = pd.read_csv(osp.join(self.raw_dir, "properties.csv"))
        targets = df[TARGET_COLUMNS].values.astype(np.float32)
        i = 0
        for shard in SDF_SHARDS:
            suppl = Chem.SDMolSupplier(
                osp.join(self.raw_dir, shard), removeHs=False, sanitize=True
            )
            for mol in suppl:
                idx = i
                i += 1
                if mol is None:
                    continue
                yield mol, targets[idx]


@registry.register_data("molecule_hg")
@registry.register_data("molecule_hg_3d")
class MoleculeHGraph(MoleculeBase):
    name = "molecule_hg"
    hyper = True

    def process(self):
        out = []
        for mol, y in self._iter_mols():
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


@registry.register_data("molecule_g")
@registry.register_data("molecule_g_3d")
class MoleculeGraph(MoleculeBase):
    name = "molecule_g"
    hyper = False

    def process(self):
        out = []
        for mol, y in self._iter_mols():
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
