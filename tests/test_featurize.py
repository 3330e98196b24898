"""Featurizer golden tests on duck-typed fake molecules (RDKit-free CI) +
dataset cache round-trip.

The fakes (`tests/fake_rdkit.py`) mirror RDKit's outputs for the same
structures, so these goldens are the ones the reference produces
(`reference equihgnn/data/utils.py:64-147`). On a machine with real RDKit the
same assertions hold with real molecules.
"""

import numpy as np
import pytest

import fake_rdkit as fr
from equihgnn_tpu.data import featurize

pytestmark = pytest.mark.quick


@pytest.fixture(autouse=True)
def _fake_chem(monkeypatch):
    fr.FakeChem.clear()
    monkeypatch.setattr(featurize, "_require_rdkit", lambda: fr.FakeChem)
    yield
    fr.FakeChem.clear()


def test_dataset_cache_roundtrip(tmp_path):
    from equihgnn_tpu.data.datasets.synthetic_ds import SyntheticHGraph3D

    ds1 = SyntheticHGraph3D(root=str(tmp_path), size=32, seed=7)
    # second construction loads from the packed npz cache
    ds2 = SyntheticHGraph3D(root=str(tmp_path), size=32, seed=7)
    assert len(ds1) == len(ds2) == 32
    for a, b in zip(ds1.samples, ds2.samples):
        np.testing.assert_array_equal(a.atom_feat, b.atom_feat)
        np.testing.assert_array_equal(a.vertex_idx, b.vertex_idx)
        np.testing.assert_array_equal(a.hedge_idx, b.hedge_idx)
        np.testing.assert_array_equal(a.hedge_feat, b.hedge_feat)
        np.testing.assert_allclose(a.y, b.y)
        np.testing.assert_allclose(a.pos, b.pos)


def test_benzene_hypergraph_golden():
    """Benzene: OGB-compatible atom/bond features + one conjugated hyperedge
    over all six ring atoms (feature 5), per `reference data/utils.py:64-105`."""
    fr.FakeChem.register_smiles("c1ccccc1", fr.benzene())
    s = featurize.smiles_to_hypergraph("c1ccccc1")
    assert s.n_atoms == 6
    # atom features: aromatic ring carbon
    want_atom = [5, 0, 3, 5, 1, 0, 1, 1, 1]
    for row in s.atom_feat:
        assert list(row) == want_atom
    # 6 aromatic bonds (order 2) + 1 conjugated hyperedge (order 6)
    assert s.n_hedges == 7
    eo = s.e_order()
    assert sorted(eo.tolist()) == [2] * 6 + [6]
    assert list(s.hedge_feat[:6]) == [3] * 6  # AROMATIC bond type
    assert s.hedge_feat[6] == 5  # conjugation feature
    assert s.smi == "c1ccccc1"


def test_ethanol_graph_golden():
    g = featurize.mol_to_graph(fr.ethanol())
    assert g.n_atoms == 3
    assert g.n_edges == 4  # 2 bonds, both directions
    # single bonds, no stereo, not conjugated
    np.testing.assert_array_equal(g.edge_feat, [[0, 0, 0]] * 4)


def test_conjugated_group_guard_and_membership():
    """Non-conjugated atoms report -1 or huge unsigned ids; the reference
    guards `-1 < g < num_he` (`utils.py:44-53`) — both must be excluded."""
    n_idx, e_idx = featurize.conjugated_groups(fr.unsorted_conj_mol())
    assert set(zip(n_idx, e_idx)) == {(0, 1), (2, 0), (3, 0), (4, 1)}


def test_incidence_sorted_by_hedge_id():
    """RDKit conj-group ids arrive in non-monotonic atom order; the featurizer
    must emit incidence stably sorted by hyperedge id so the sorted-segment
    fast path holds on real data (ADVICE r1 #1)."""
    mol = fr.unsorted_conj_mol()
    s = featurize.mol_to_hypergraph(mol)
    assert np.all(np.diff(s.hedge_idx) >= 0)
    # semantics preserved: conj hyperedges (ids 5=num_bonds+0, 6=+1) keep
    # their member sets
    members = {
        h: set(s.vertex_idx[s.hedge_idx == h].tolist()) for h in (5, 6)
    }
    assert members[5] == {2, 3}
    assert members[6] == {0, 4}
    eo = s.e_order()
    assert eo.tolist() == [2, 2, 2, 2, 2, 2, 2]


def test_random_mols_always_sorted(rng):
    for _ in range(25):
        s = featurize.mol_to_hypergraph(fr.random_mol(rng))
        assert np.all(np.diff(s.hedge_idx) >= 0)
        # bincount over sorted == bincount over any order (sanity)
        assert s.nnz == len(s.vertex_idx)


def test_bondless_molecule_is_total():
    mol = fr.FakeMol([fr.FakeAtom(8, total_degree=0, total_num_hs=2)], [])
    s = featurize.mol_to_hypergraph(mol)
    assert s.n_atoms == 1 and s.n_hedges == 0 and s.nnz == 0


def test_ring_lift_features():
    """compute_ring_features/extract_ring_info parity (`utils.py:8-32`) —
    shipped-unused in the reference, exercised here for coverage."""
    mol = fr.benzene()
    cells = featurize.extract_ring_info(mol)
    assert len(cells) == 1
    (idc, feats), = cells
    assert idc == frozenset(range(6))
    assert feats == (6.0, 1.0, 0.0, 0.0)  # size 6, aromatic, all-C, not SP3
