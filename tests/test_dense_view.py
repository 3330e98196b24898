"""Dense per-molecule view: slot tables and EGNN dense-vs-flat parity."""

import jax
import jax.numpy as jnp
import numpy as np

from equihgnn_tpu.data.batching import pad_hypergraph_batch, spec_for_samples
from equihgnn_tpu.data.synthetic import make_synthetic_dataset
from equihgnn_tpu.nn.egnn import EGNN


def test_slot_tables_roundtrip():
    samples = make_synthetic_dataset(10, seed=5)
    spec = spec_for_samples(samples, batch_size=10)
    b = pad_hypergraph_batch(samples, spec, target=0, with_pos=True)
    # slot_index[g, atom_slot[i]] == i for every real atom i of graph g
    idx = np.where(b.atom_mask)[0]
    g = b.atom_graph_id[idx]
    s = b.atom_slot[idx]
    np.testing.assert_array_equal(b.slot_index[g, s], idx)
    assert np.all(b.slot_mask[g, s])
    assert b.slot_mask.sum() == b.atom_mask.sum()


def test_egnn_dense_matches_flat():
    samples = make_synthetic_dataset(8, seed=6)
    spec = spec_for_samples(samples, batch_size=8)
    b = pad_hypergraph_batch(samples, spec, target=0, with_pos=True)
    b = jax.tree.map(jnp.asarray, b)

    layer = EGNN(dim=12, num_nearest_neighbors=6, valid_radius=1e6)
    feats = jax.random.normal(jax.random.PRNGKey(0), (b.num_atoms, 12))
    params = layer.init(
        jax.random.PRNGKey(1), feats, b.pos, mask=b.atom_mask,
        graph_id=b.atom_graph_id,
    )
    f_flat, c_flat = layer.apply(
        params, feats, b.pos, mask=b.atom_mask, graph_id=b.atom_graph_id
    )
    f_dense, c_dense = layer.apply(
        params, feats, b.pos, mask=b.atom_mask, graph_id=b.atom_graph_id,
        slot_index=b.slot_index, slot_mask=b.slot_mask, atom_slot=b.atom_slot,
    )
    m = np.asarray(b.atom_mask)
    np.testing.assert_allclose(
        np.asarray(f_flat)[m], np.asarray(f_dense)[m], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(c_flat)[m], np.asarray(c_dense)[m], rtol=1e-4, atol=1e-5
    )
