"""First-party SMILES parser vs the SDF-derived ground truth + spec cases.

The same 20 literature molecules as tests/test_real_molecules.py, written
as SMILES, must produce identical perception (heavy-atom count, implicit H,
aromaticity, conjugated-group sizes) to the SDF route — plus bracket-atom,
charge, ring-closure, and aromatic-bond-resolution specifics.
"""

from __future__ import annotations

import numpy as np
import pytest

from equihgnn_tpu.data.featurize import (
    atom_to_feature_vector,
    mol_to_hypergraph,
    smiles_to_hypergraph,
)
from equihgnn_tpu.data.smiles import parse_smiles

pytestmark = pytest.mark.quick

# name -> (smiles, heavy atoms, [conjugated group sizes]) — ground truth
# matches tests/test_real_molecules.py
CASES = {
    "methane": ("C", 1, []),
    "ethane": ("CC", 2, []),
    "ethylene": ("C=C", 2, []),
    "acetylene": ("C#C", 2, []),
    "benzene": ("c1ccccc1", 6, [6]),
    "toluene": ("Cc1ccccc1", 7, [6]),
    "styrene": ("C=Cc1ccccc1", 8, [8]),
    "biphenyl": ("c1ccc(cc1)-c1ccccc1", 12, [12]),
    "biphenyl (implicit bridge)": ("c1ccc(cc1)c1ccccc1", 12, [12]),
    "naphthalene": ("c1ccc2ccccc2c1", 10, [10]),
    "pyridine": ("c1ccncc1", 6, [6]),
    "furan": ("c1ccoc1", 5, [5]),
    "butadiene": ("C=CC=C", 4, [4]),
    "penta-1,4-diene": ("C=CCC=C", 5, []),
    "formamide": ("NC=O", 3, [3]),
    "acetone": ("CC(=O)C", 4, []),
    "acetic acid": ("CC(=O)O", 4, [3]),
    "acrylonitrile": ("C=CC#N", 4, [4]),
    "fluorobenzene": ("Fc1ccccc1", 7, [7]),
    "aniline": ("Nc1ccccc1", 7, [7]),
    "phenol": ("Oc1ccccc1", 7, [7]),
}


def _group_sizes(m):
    sizes = {}
    for g in m.conj_grp:
        if g >= 0:
            sizes[g] = sizes.get(g, 0) + 1
    return sorted(sizes.values())


@pytest.mark.parametrize("name", list(CASES))
def test_ground_truth(name):
    smi, na, groups = CASES[name]
    m = parse_smiles(smi)
    assert m is not None, smi
    assert m.GetNumAtoms() == na
    assert _group_sizes(m) == sorted(groups)


def test_implicit_hydrogens():
    # benzene C: 1H; pyridine N: 0H; pyrrole [nH]: exactly 1; thiophene S: 0
    assert [a.GetTotalNumHs() for a in parse_smiles("c1ccccc1").GetAtoms()] \
        == [1] * 6
    pyr = parse_smiles("c1cc[nH]c1")
    ns = [a for a in pyr.GetAtoms() if a.GetAtomicNum() == 7]
    assert ns[0].GetTotalNumHs() == 1
    thio = parse_smiles("c1ccsc1")
    s = [a for a in thio.GetAtoms() if a.GetAtomicNum() == 16][0]
    assert s.GetTotalNumHs() == 0
    # methane 4, ammonium [NH4+] exactly 4, water-O 2
    assert parse_smiles("C").GetAtoms()[0].GetTotalNumHs() == 4
    assert parse_smiles("[NH4+]").GetAtoms()[0].GetTotalNumHs() == 4
    assert parse_smiles("O").GetAtoms()[0].GetTotalNumHs() == 2


def test_charges_and_salt():
    # nitro group, charge-separated form
    nitro = parse_smiles("c1ccccc1[N+](=O)[O-]")
    charges = [a.GetFormalCharge() for a in nitro.GetAtoms()]
    assert charges.count(1) == 1 and charges.count(-1) == 1
    # disconnected salt: sodium acetate
    salt = parse_smiles("CC(=O)[O-].[Na+]")
    assert salt.GetNumAtoms() == 5
    assert len(salt.GetBonds()) == 3  # no bond across the '.'
    na = [a for a in salt.GetAtoms() if a.GetAtomicNum() == 11][0]
    assert na.GetFormalCharge() == 1 and na.GetTotalNumHs() == 0


def test_aromatic_bond_resolution():
    # biphenyl without explicit '-': bridge is SINGLE (not in a ring)
    m = parse_smiles("c1ccc(cc1)c1ccccc1")
    singles = [b for b in m.GetBonds() if b.GetBondType() == "SINGLE"]
    assert len(singles) == 1
    aroms = [b for b in m.GetBonds() if b.GetBondType() == "AROMATIC"]
    assert len(aroms) == 12
    # naphthalene: the fusion bond IS aromatic (in a ring)
    naph = parse_smiles("c1ccc2ccccc2c1")
    assert all(b.GetBondType() == "AROMATIC" for b in naph.GetBonds())


def test_ring_closure_forms():
    # %10 two-digit closure, bond symbol on the closure
    m = parse_smiles("C%10CCCCC%10")
    assert m.GetNumAtoms() == 6 and len(m.GetBonds()) == 6
    m2 = parse_smiles("C=1CCCCC=1")
    assert sum(b.GetBondType() == "DOUBLE" for b in m2.GetBonds()) == 1
    # conflicting closure symbols reject
    assert parse_smiles("C=1CCCCC#1") is None
    # unclosed ring rejects
    assert parse_smiles("C1CCC") is None


def test_two_letter_and_bracket_elements():
    sel = parse_smiles("c1cc[se]1")  # selenophene-like 4-ring for parsing
    assert sel is not None
    assert [a.GetAtomicNum() for a in sel.GetAtoms()].count(34) == 1
    assert parse_smiles("ClCCBr").GetNumAtoms() == 4
    assert parse_smiles("[13CH4]").GetAtoms()[0].GetTotalNumHs() == 4
    assert parse_smiles("[C@@H](N)(C)O").GetNumAtoms() == 4


def test_rejects_garbage():
    for bad in ("", "X", "C(", "C)", "[Zz]", "c1ccccc", "[]"):
        assert parse_smiles(bad) is None, bad


def test_featurizer_smiles_route_matches_sdf_route():
    """smiles_to_hypergraph (RDKit-free fallback) == mol_to_hypergraph on the
    SDF-derived molecule, feature-for-feature, for an aromatic heterocycle."""
    import os

    from equihgnn_tpu.data.sdf import read_sdf, read_titles

    here = os.path.dirname(os.path.abspath(__file__))
    sdf = os.path.join(here, "..", "datasets", "real_sample", "sample.sdf")
    mols = dict(zip(read_titles(sdf), read_sdf(sdf)))
    for name, smi in [("pyridine", "c1ccncc1"), ("styrene", "C=Cc1ccccc1"),
                      ("formamide", "NC=O"), ("biphenyl", "c1ccc(cc1)-c1ccccc1")]:
        s_sdf = mol_to_hypergraph(mols[name], y=np.float32([0.0]))
        s_smi = smiles_to_hypergraph(smi, y=np.float32([0.0]))
        assert s_smi is not None
        assert s_smi.atom_feat.shape == s_sdf.atom_feat.shape
        # same multiset of atom feature rows (atom order may differ)
        a = np.asarray(sorted(map(tuple, s_sdf.atom_feat.tolist())))
        b = np.asarray(sorted(map(tuple, s_smi.atom_feat.tolist())))
        np.testing.assert_array_equal(a, b)
        # same hyperedge structure sizes
        assert s_smi.hedge_feat.shape == s_sdf.hedge_feat.shape
        np.testing.assert_array_equal(
            np.sort(s_smi.e_order()), np.sort(s_sdf.e_order())
        )


def test_atom_features_from_smiles():
    f = atom_to_feature_vector(parse_smiles("c1ccccc1").GetAtoms()[0])
    assert f[0] == 5  # C
    assert f[4] == 1  # 1 implicit H
    assert f[6] == 1  # SP2
    assert f[7] == 1 and f[8] == 1  # aromatic, in ring
