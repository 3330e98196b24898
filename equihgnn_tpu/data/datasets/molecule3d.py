"""Molecule3D: ~3.9M molecules with DFT geometries, 7 targets.

Re-design of `reference equihgnn/data/molecule3d.py:16-260`. Raw data is a
Google-Drive folder (4 combined SDF shards + properties.csv + split-index
JSONs), fetched by the first-party `download_gdrive_folder` (gdown is not in
this image) with the reference's exact post-download choreography
(extract data.zip at the root, move data/raw/* into raw_dir). Drive page
formats drift, so staging the raw files manually also works. SDF parsing
uses sanitize=True (reference `molecule3d.py:141,205`).
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
        """Replicates `reference equihgnn/data/molecule3d.py:88-110`:
        fetch the Drive folder (one data.zip), extract at the dataset root,
        move `<root>/data/raw/*` into raw_dir, drop the zip + __MACOSX."""
        import os
        import shutil

        from equihgnn_tpu.data.datasets.download import (
            download_gdrive_folder,
            extract_zip,
        )

        missing = [
            f for f in SDF_SHARDS + ["properties.csv"]
            if not osp.exists(osp.join(self.raw_dir, f))
        ]
        if not missing:
            return
        base = os.environ.get(
            "EQUIHGNN_GDRIVE_BASE", "https://drive.google.com"
        )
        try:
            download_gdrive_folder(GDRIVE_ID, self.raw_dir, base_url=base)
        except OSError as e:
            raise OSError(
                f"Molecule3D raw files missing ({missing[:2]}...) and the "
                f"Google-Drive folder fetch failed ({e}). Download folder id "
                f"{GDRIVE_ID} manually into {self.raw_dir}."
            ) from e
        file_path = osp.join(self.raw_dir, "data.zip")
        extract_zip(file_path, self.root)
        os.unlink(file_path)
        unzipped = osp.join(self.root, "data", "raw")
        print(f"Move data from {unzipped} to {self.raw_dir}")
        for item in os.listdir(unzipped):
            shutil.move(
                osp.join(unzipped, item), osp.join(self.raw_dir, item)
            )
        shutil.rmtree(osp.dirname(unzipped))
        macosx = osp.join(self.root, "__MACOSX")
        if osp.exists(macosx):
            shutil.rmtree(macosx)

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
