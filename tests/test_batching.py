import numpy as np

from equihgnn_tpu.data.batching import (
    BatchSpec,
    iter_batches,
    pad_graph_batch,
    pad_hypergraph_batch,
    spec_for_samples,
)
from equihgnn_tpu.data.synthetic import make_synthetic_dataset
import pytest

pytestmark = pytest.mark.quick


def test_hypergraph_packing_invariants(rng):
    samples = make_synthetic_dataset(10, seed=1)
    spec = spec_for_samples(samples, batch_size=10)
    b = pad_hypergraph_batch(samples, spec, target=0, with_pos=True)

    # every real incidence entry points at a real atom/hedge of the same graph
    assert b.inc_mask.sum() == sum(s.nnz for s in samples)
    v, e = b.vertex_idx[b.inc_mask], b.hedge_idx[b.inc_mask]
    assert np.all(b.atom_mask[v]) and np.all(b.hedge_mask[e])
    assert np.all(b.atom_graph_id[v] == b.hedge_graph_id[e])

    # e_order matches incidence counts
    counts = np.bincount(e, minlength=spec.num_hedges)
    assert np.all(counts[b.hedge_mask] == b.e_order[b.hedge_mask])

    # padding points at the reserved graph/atom/hedge slots
    assert np.all(b.atom_graph_id[~b.atom_mask] == spec.num_graphs - 1)
    assert not b.graph_mask[-1]
    assert b.graph_mask.sum() == 10

    # targets
    assert np.allclose(b.y[:10], [s.y[0] for s in samples])


def test_graph_packing_invariants(rng):
    samples = make_synthetic_dataset(8, seed=2, hyper=False)
    spec = spec_for_samples(samples, batch_size=8)
    b = pad_graph_batch(samples, spec, target=3, with_pos=True)
    src, dst = b.edge_src[b.edge_mask], b.edge_dst[b.edge_mask]
    assert np.all(b.atom_mask[src]) and np.all(b.atom_mask[dst])
    assert np.all(b.atom_graph_id[src] == b.atom_graph_id[dst])
    assert b.edge_mask.sum() == sum(s.n_edges for s in samples)


def test_iter_batches_covers_all(rng):
    samples = make_synthetic_dataset(101, seed=3)
    spec = spec_for_samples(samples, batch_size=16)
    batches = list(iter_batches(samples, spec, target=0, with_pos=True, shuffle=True,
                                rng=np.random.default_rng(0)))
    total = sum(int(b.graph_mask.sum()) for b in batches)
    assert total == 101
    ys = np.concatenate([b.y[b.graph_mask] for b in batches])
    assert np.allclose(sorted(ys), sorted(s.y[0] for s in samples))


def test_single_molecule_always_fits():
    samples = make_synthetic_dataset(50, seed=4, max_atoms=29)
    spec = spec_for_samples(samples, batch_size=2)
    for s in samples:
        pad_hypergraph_batch([s], spec, target=0, with_pos=True)
