"""Molecule → (hyper)graph featurization (host-side, offline, RDKit-gated).

Reimplements the reference featurizers without the `ogb` dependency:
  * OGB-compatible 9-dim atom / 3-dim bond feature vectors
    (vocab sizes in `equihgnn_tpu/data/structures.py`)
  * `mol_to_hypergraph` ≡ `mol2hgraph` (`reference equihgnn/data/utils.py:108-147`):
    one order-2 hyperedge per bond (feature = bond type) + one hyperedge per
    conjugated group found by RDKit's ResonanceMolSupplier (feature = 5)
  * `smiles_to_hypergraph` ≡ `smi2hgraph` (`utils.py:64-105`)
  * `mol_to_graph` ≡ `mol2graph` (`utils.py:192-238`): directed-both-ways
    plain graph with 3 bond features.

RDKit runs once, offline, on the host — there is no on-TPU equivalent needed
(SURVEY §2.9). Import of RDKit is deferred so the rest of the framework works
in RDKit-free environments.
"""

from __future__ import annotations

import numpy as np

from equihgnn_tpu.data.structures import (
    CONJ_HEDGE_TYPE,
    GraphSample,
    HyperGraphSample,
)


def _require_rdkit():
    try:
        from rdkit import Chem  # noqa: F401

        return Chem
    except ImportError as e:  # pragma: no cover - env without rdkit
        raise ImportError(
            "RDKit is required for molecule featurization (offline dataset "
            "processing). Install rdkit, or use the synthetic_* datasets."
        ) from e


# --------------------------------------------------------------- OGB features
_CHIRALITY = ["CHI_UNSPECIFIED", "CHI_TETRAHEDRAL_CW", "CHI_TETRAHEDRAL_CCW", "CHI_OTHER"]
_HYBRIDIZATION = ["SP", "SP2", "SP3", "SP3D", "SP3D2", "misc"]
_BOND_TYPE = ["SINGLE", "DOUBLE", "TRIPLE", "AROMATIC", "misc"]
_BOND_STEREO = [
    "STEREONONE", "STEREOZ", "STEREOE", "STEREOCIS", "STEREOTRANS", "STEREOANY",
]


def _safe_index(lst, x):
    try:
        return lst.index(x)
    except ValueError:
        return len(lst) - 1


def atom_to_feature_vector(atom) -> list[int]:
    """OGB `atom_to_feature_vector` (vocab (119,4,12,12,10,6,6,2,2))."""
    num = atom.GetAtomicNum()
    return [
        num - 1 if 1 <= num <= 118 else 118,
        _safe_index(_CHIRALITY, str(atom.GetChiralTag())),
        _safe_index(list(range(11)) + ["misc"], atom.GetTotalDegree()),
        _safe_index(list(range(-5, 6)) + ["misc"], atom.GetFormalCharge()),
        _safe_index(list(range(9)) + ["misc"], atom.GetTotalNumHs()),
        _safe_index(list(range(5)) + ["misc"], atom.GetNumRadicalElectrons()),
        _safe_index(_HYBRIDIZATION, str(atom.GetHybridization())),
        int(atom.GetIsAromatic()),
        int(atom.IsInRing()),
    ]


def bond_to_feature_vector(bond) -> list[int]:
    """OGB `bond_to_feature_vector` (vocab (5,6,2))."""
    return [
        _safe_index(_BOND_TYPE, str(bond.GetBondType())),
        _safe_index(_BOND_STEREO, str(bond.GetStereo())),
        int(bond.GetIsConjugated()),
    ]


# ------------------------------------------------------------------ ring lift
def compute_ring_features(ring, molecule):
    """(size, is_aromatic, has_heteroatom, is_saturated) of one ring.

    ≡ `reference equihgnn/data/utils.py:8-32` (provenance
    topological-equivariant-networks). Like the reference, this is shipped but
    not consumed by any dataset — kept for capability parity.
    """
    Chem = _require_rdkit()
    atoms = [molecule.GetAtomWithIdx(i) for i in ring]
    return (
        float(len(ring)),
        float(all(a.GetIsAromatic() for a in atoms)),
        float(any(a.GetSymbol() not in ("C", "H") for a in atoms)),
        float(
            all(a.GetHybridization() == Chem.HybridizationType.SP3 for a in atoms)
        ),
    )


def extract_ring_info(mol):
    """{(frozen atom set, ring feature vector)} (≡ `reference utils.py:24-32`)."""
    cells = set()
    for ring in mol.GetRingInfo().AtomRings():
        idc = frozenset(ring)
        cells.add((idc, compute_ring_features(idc, mol)))
    return cells


class OneTarget:
    """Select one target column of a sample's y (≡ `reference utils.py:181-189`).

    The TPU pipeline normally selects targets in the batcher (`target=` arg);
    this transform exists for API parity with the reference.
    """

    def __init__(self, target: int = 0):
        self.target = target

    def __call__(self, sample):
        sample.y = np.asarray(sample.y, dtype=np.float32).reshape(-1)[self.target]
        return sample


# ------------------------------------------------------------- conjugation lift
def conjugated_groups(mol):
    """(node_idx, hedge_idx) membership of conjugated π-systems.

    ≡ `he_conj` (`reference equihgnn/data/utils.py:35-54`): RDKit
    ResonanceMolSupplier assigns each atom a conjugated-group id (or -1).

    Molecules that carry their own perception (first-party
    `equihgnn_tpu.data.chem.Mol`, whose conjugation rules re-derive RDKit's
    Conjugation.cpp — validated on real structures in
    tests/test_real_molecules.py) act as their own supplier, so raw-SDF
    processing works in an RDKit-free image.
    """
    if hasattr(mol, "GetAtomConjGrpIdx"):
        reso = mol
    else:
        Chem = _require_rdkit()
        reso = Chem.ResonanceMolSupplier(mol)
    num_he = reso.GetNumConjGrps()
    n_idx, e_idx = [], []
    for i in range(mol.GetNumAtoms()):
        g = reso.GetAtomConjGrpIdx(i)
        # reference guards -1 < g < num_he (GetAtomConjGrpIdx returns huge
        # unsigned values for non-conjugated atoms in some RDKit builds)
        if -1 < g < num_he:
            n_idx.append(i)
            e_idx.append(g)
    return n_idx, e_idx


# ------------------------------------------------------------------ featurizers
def mol_to_hypergraph(mol, y=None, pos=None, z=None) -> HyperGraphSample | None:
    """≡ `mol2hgraph`: bond hyperedges (order 2) + conjugated-group hyperedges.

    Returns None for bond-less molecules (the reference prints and returns a
    degenerate tuple; every caller then stores a sample with no hyperedges —
    we keep it total by returning an empty-hyperedge sample instead).
    """
    atom_feat = np.array(
        [atom_to_feature_vector(a) for a in mol.GetAtoms()], dtype=np.int32
    )
    bonds = mol.GetBonds()
    n_idx: list[int] = []
    e_idx: list[int] = []
    hedge_feat: list[int] = []
    for i, bond in enumerate(bonds):
        n_idx += [bond.GetBeginAtomIdx(), bond.GetEndAtomIdx()]
        e_idx += [i, i]
        hedge_feat.append(bond_to_feature_vector(bond)[0])

    if bonds:
        he_n, he_e = conjugated_groups(mol)
        if he_n:
            num_bond = len(bonds)
            n_idx += he_n
            e_idx += [g + num_bond for g in he_e]
            hedge_feat += len(set(he_e)) * [CONJ_HEDGE_TYPE]

    vertex_idx = np.asarray(n_idx, dtype=np.int64)
    hedge_idx = np.asarray(e_idx, dtype=np.int64)
    # Stably sort incidence by hyperedge id: RDKit conjugated-group ids are
    # assigned in discovery order, not atom order, so the conj tail of e_idx
    # can be non-monotonic. Downstream the hyperedge-direction reduction
    # assumes sorted ids (Pallas sorted-segment kernel fast path); scatter
    # results are permutation-invariant, so sorting here is semantics-free.
    order = np.argsort(hedge_idx, kind="stable")
    vertex_idx, hedge_idx = vertex_idx[order], hedge_idx[order]

    return HyperGraphSample(
        atom_feat=atom_feat,
        vertex_idx=vertex_idx,
        hedge_idx=hedge_idx,
        hedge_feat=np.asarray(hedge_feat, dtype=np.int64),
        y=np.asarray(y, dtype=np.float32) if y is not None else np.zeros(1, np.float32),
        pos=None if pos is None else np.asarray(pos, dtype=np.float32),
        z=None if z is None else np.asarray(z, dtype=np.int32),
    )


def mol_from_smiles(smiles: str):
    """RDKit's MolFromSmiles when installed; else the first-party parser
    (`data/smiles.py`). Returns None on unparsable input either way."""
    try:
        Chem = _require_rdkit()
    except ImportError:
        from equihgnn_tpu.data.smiles import parse_smiles

        return parse_smiles(smiles)
    return Chem.MolFromSmiles(smiles)


def smiles_to_hypergraph(smiles: str, y=None) -> HyperGraphSample | None:
    """≡ `smi2hgraph` (`reference utils.py:64-105`)."""
    mol = mol_from_smiles(smiles)
    if mol is None:
        return None
    s = mol_to_hypergraph(mol, y=y)
    if s is not None:
        s.smi = smiles
    return s


def mol_to_graph(mol, y=None, pos=None, z=None) -> GraphSample:
    """≡ `mol2graph` (`reference utils.py:192-238`): directed both ways."""
    atom_feat = np.array(
        [atom_to_feature_vector(a) for a in mol.GetAtoms()], dtype=np.int32
    )
    src, dst, feats = [], [], []
    for bond in mol.GetBonds():
        i, j = bond.GetBeginAtomIdx(), bond.GetEndAtomIdx()
        f = bond_to_feature_vector(bond)
        src += [i, j]
        dst += [j, i]
        feats += [f, f]
    return GraphSample(
        atom_feat=atom_feat,
        edge_src=np.asarray(src, dtype=np.int64),
        edge_dst=np.asarray(dst, dtype=np.int64),
        edge_feat=(
            np.asarray(feats, dtype=np.int64)
            if feats
            else np.zeros((0, 3), dtype=np.int64)
        ),
        y=np.asarray(y, dtype=np.float32) if y is not None else np.zeros(1, np.float32),
        pos=None if pos is None else np.asarray(pos, dtype=np.float32),
        z=None if z is None else np.asarray(z, dtype=np.int32),
    )
