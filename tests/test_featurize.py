"""Featurizer golden tests (run only where RDKit is installed) + dataset
cache round-trip (RDKit-free)."""

import numpy as np
import pytest


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
    pytest.importorskip("rdkit", reason="RDKit not installed in this image")
    """Benzene: OGB-compatible atom/bond features + one conjugated hyperedge
    over all six ring atoms (feature 5), per `reference data/utils.py:64-105`."""
    from equihgnn_tpu.data.featurize import smiles_to_hypergraph

    s = smiles_to_hypergraph("c1ccccc1")
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


def test_ethanol_graph_golden():
    pytest.importorskip("rdkit", reason="RDKit not installed in this image")
    from equihgnn_tpu.data.featurize import mol_to_graph
    from rdkit import Chem

    mol = Chem.MolFromSmiles("CCO")
    g = mol_to_graph(mol)
    assert g.n_atoms == 3
    assert g.n_edges == 4  # 2 bonds, both directions
    # single bonds, no stereo, not conjugated
    np.testing.assert_array_equal(g.edge_feat, [[0, 0, 0]] * 4)
