"""QM9: ~130k small molecules, 16 regression targets with unit conversion.

Re-design of `reference equihgnn/data/qm9.py:25-405`. Four variants:
hypergraph / plain graph × with / without 3-D conformer positions. Parity
notes (SURVEY §2.4):
  * unit conversion vector (HAR2EV for energies, KCALMOL2EV for atomization)
    multiplies the raw CSV targets (`qm9.py:72-113,159-163`)
  * SDMolSupplier(removeHs=False, sanitize=False)
  * only the plain-graph variants honor the `uncharacterized.txt` skip list
    (`qm9.py:297-298,357-358`) — the hypergraph variants do NOT (replicated)
  * the graph variants store a 1-dim bond-type edge feature, not the 3-dim
    mol2graph features (`qm9.py:309-319`).
"""

from __future__ import annotations

import os
import os.path as osp

import numpy as np

from equihgnn_tpu.common.registry import registry
from equihgnn_tpu.data.datasets.base import MolDataset
from equihgnn_tpu.data.datasets.download import download_url, extract_zip
from equihgnn_tpu.data.featurize import (
    _require_rdkit,
    atom_to_feature_vector,
    bond_to_feature_vector,
    mol_to_hypergraph,
)
from equihgnn_tpu.data.structures import GraphSample

HAR2EV = 27.211386246
KCALMOL2EV = 0.04336414

CONVERSION = np.array(
    [1.0, 1.0, HAR2EV, HAR2EV, HAR2EV, 1.0, HAR2EV, HAR2EV, HAR2EV, HAR2EV,
     HAR2EV, 1.0, KCALMOL2EV, KCALMOL2EV, KCALMOL2EV, KCALMOL2EV],
    dtype=np.float32,
)

TARGET_NAMES = [
    "mu", "alpha", "homo", "lumo", "gap", "r2", "zpve", "u0", "u298",
    "h298", "g298", "cv", "u0_atom", "u298_atom", "h298_atom", "g298_atom",
]

RAW_URL = (
    "https://deepchemdata.s3-us-west-1.amazonaws.com/datasets/"
    "molnet_publish/qm9.zip"
)
RAW_URL2 = "https://ndownloader.figshare.com/files/3195404"


class QM9Base(MolDataset):
    num_targets = 16
    use_skip_list = False

    @property
    def raw_dir(self):
        return osp.join(self.root, "raw")

    def _download_raw(self):
        os.makedirs(self.raw_dir, exist_ok=True)
        sdf = osp.join(self.raw_dir, "gdb9.sdf")
        if not osp.exists(sdf):
            path = download_url(RAW_URL, osp.join(self.raw_dir, "qm9.zip"))
            extract_zip(path, self.raw_dir)
            os.unlink(path)
        skip = osp.join(self.raw_dir, "uncharacterized.txt")
        if not osp.exists(skip):
            download_url(RAW_URL2, skip)
        return sdf, osp.join(self.raw_dir, "gdb9.sdf.csv"), skip

    def _targets(self, csv_path) -> np.ndarray:
        import pandas as pd

        df = pd.read_csv(csv_path)
        return df[TARGET_NAMES].values.astype(np.float32) * CONVERSION[None, :]

    def _skip_set(self, skip_path) -> set[int]:
        with open(skip_path) as f:
            return {int(x.split()[0]) - 1 for x in f.read().split("\n")[9:-2]}

    def _iter_mols(self):
        Chem = _require_rdkit()
        sdf, csv, skip_path = self._download_raw()
        targets = self._targets(csv)
        skip = self._skip_set(skip_path) if self.use_skip_list else set()
        suppl = Chem.SDMolSupplier(sdf, removeHs=False, sanitize=False)
        for i, mol in enumerate(suppl):
            if mol is None or i in skip:
                continue
            yield i, mol, targets[i]


class _QM9Hyper(QM9Base):
    hyper = True

    def process(self):
        out = []
        for i, mol, y in self._iter_mols():
            try:
                pos = z = None
                if self.has_pos:
                    conf = mol.GetConformer()
                    pos = np.asarray(conf.GetPositions(), dtype=np.float32)
                    z = np.asarray(
                        [a.GetAtomicNum() for a in mol.GetAtoms()], dtype=np.int32
                    )
                s = mol_to_hypergraph(mol, y=y, pos=pos, z=z)
            except Exception as e:  # malformed molecules skipped, as reference
                print(e)
                continue
            out.append(s)
        return out


class _QM9Graph(QM9Base):
    hyper = False
    use_skip_list = True

    def process(self):
        out = []
        for i, mol, y in self._iter_mols():
            atom_feat = np.array(
                [atom_to_feature_vector(a) for a in mol.GetAtoms()], dtype=np.int32
            )
            src, dst, feats = [], [], []
            for bond in mol.GetBonds():
                a, b = bond.GetBeginAtomIdx(), bond.GetEndAtomIdx()
                t = bond_to_feature_vector(bond)[0]
                src += [a, b]
                dst += [b, a]
                feats += [[t], [t]]
            pos = z = None
            if self.has_pos:
                conf = mol.GetConformer()
                pos = np.asarray(conf.GetPositions(), dtype=np.float32)
                z = np.asarray(
                    [a.GetAtomicNum() for a in mol.GetAtoms()], dtype=np.int32
                )
            out.append(
                GraphSample(
                    atom_feat=atom_feat,
                    edge_src=np.asarray(src, dtype=np.int64),
                    edge_dst=np.asarray(dst, dtype=np.int64),
                    edge_feat=(
                        np.asarray(feats, dtype=np.int64)
                        if feats
                        else np.zeros((0, 1), np.int64)
                    ),
                    y=y,
                    pos=pos,
                    z=z,
                )
            )
        return out


@registry.register_data("qm9_hg_3d")
class QM9HGraph3D(_QM9Hyper):
    name = "qm9_hg_3d"
    has_pos = True


@registry.register_data("qm9_hg")
class QM9HGraph(_QM9Hyper):
    name = "qm9_hg"
    has_pos = False


@registry.register_data("qm9_g")
class QM9Graph(_QM9Graph):
    name = "qm9_g"
    has_pos = False


@registry.register_data("qm9_g_3d")
class QM9Graph3D(_QM9Graph):
    name = "qm9_g_3d"
    has_pos = True
