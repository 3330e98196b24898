"""Native C++ packer: exact parity with the Python packer + speed sanity."""

import time

import numpy as np
import pytest

from equihgnn_tpu.data.batching import pad_hypergraph_batch, spec_for_samples
from equihgnn_tpu.data.packed import PackedSamples, iter_packed_batches, pack_batch
from equihgnn_tpu.data.synthetic import make_synthetic_dataset
from equihgnn_tpu.native import native_available

pytestmark = pytest.mark.quick


@pytest.fixture(scope="module")
def data():
    samples = make_synthetic_dataset(200, seed=9)
    spec = spec_for_samples(samples, batch_size=32)
    packed = PackedSamples.from_samples(samples)
    return samples, spec, packed


def _assert_batches_equal(a, b):
    for field in (
        "atom_feat", "atom_mask", "atom_graph_id", "vertex_idx", "hedge_idx",
        "inc_mask", "hedge_feat", "hedge_mask", "hedge_graph_id", "e_order",
        "y", "graph_mask", "pos", "z", "slot_index", "slot_mask", "atom_slot",
        "hedge_row", "hedge_slot", "hedge_slot_index", "hedge_slot_mask",
        "inc_slot_atom", "inc_slot_hedge", "inc_slot_mask",
    ):
        x, y_ = getattr(a, field), getattr(b, field)
        if x is None or y_ is None:
            assert x is None and y_ is None, field
            continue
        np.testing.assert_array_equal(
            np.asarray(x), np.asarray(y_), err_msg=field
        )


def test_native_builds():
    assert native_available(), "g++ packer should build in this image"


def test_native_matches_python(data):
    samples, spec, packed = data
    members = np.arange(24)
    want = pad_hypergraph_batch(
        [samples[i] for i in members], spec, target=2, with_pos=True
    )
    got = pack_batch(packed, members, spec, target=2, with_pos=True)
    _assert_batches_equal(want, got)


def test_iter_packed_covers_all(data):
    samples, spec, packed = data
    total = 0
    for b in iter_packed_batches(packed, spec, target=0, with_pos=True,
                                 shuffle=True, rng=np.random.default_rng(1)):
        total += int(b.graph_mask.sum())
    assert total == len(samples)


def test_native_overflow_raises(data):
    samples, spec, packed = data
    from equihgnn_tpu.data.batching import BatchSpec

    tiny = BatchSpec(num_graphs=33, num_atoms=8, num_hedges=8, nnz=8,
                     max_atoms_per_graph=32)
    with pytest.raises(ValueError, match="native packer failed"):
        pack_batch(packed, np.arange(4), tiny, target=0, with_pos=True)


def test_native_is_faster(data):
    samples, spec, packed = data
    members = np.arange(24)
    # warm both paths
    pack_batch(packed, members, spec, target=0, with_pos=True)
    pad_hypergraph_batch([samples[i] for i in members], spec, target=0,
                         with_pos=True)
    t0 = time.perf_counter()
    for _ in range(20):
        pack_batch(packed, members, spec, target=0, with_pos=True)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(20):
        pad_hypergraph_batch([samples[i] for i in members], spec, target=0,
                             with_pos=True)
    t_python = time.perf_counter() - t0
    print(f"native {t_native*50:.2f} ms/batch vs python {t_python*50:.2f} ms/batch")
    assert t_native < t_python  # should be much faster; conservative bound


def test_native_pack_slots_matches_python(data):
    samples, spec, packed = data
    members = np.arange(24)
    want = pad_hypergraph_batch(
        [samples[i] for i in members], spec, target=1, with_pos=True,
        pack_slots=True,
    )
    got = pack_batch(packed, members, spec, target=1, with_pos=True,
                     pack_slots=True)
    _assert_batches_equal(want, got)
    for field in ("slot_gid", "atom_row"):
        np.testing.assert_array_equal(
            np.asarray(getattr(want, field)), np.asarray(getattr(got, field)),
            err_msg=field,
        )
    assert got.rows_are_molecules is False


def test_iter_packed_pack_slots_covers_all(data):
    samples, spec, packed = data
    total = 0
    for b in iter_packed_batches(packed, spec, target=0, with_pos=True,
                                 pack_slots=True):
        total += int(b.graph_mask.sum())
        assert b.slot_index.shape[0] == spec.num_slot_rows
    assert total == len(samples)
