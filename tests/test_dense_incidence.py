"""Dense slot-incidence hypergraph conv must match the flat segment path.

The dense view turns every V→E / E→V reduction into batched one-hot matmuls
(`nn/hgconv.py`); sums, mean counts, and mask semantics must be identical to
`masked_segment_reduce` up to fp association.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from equihgnn_tpu import create_model
from equihgnn_tpu.data.batching import pad_hypergraph_batch, spec_for_samples
from equihgnn_tpu.data.structures import incidence_slots
from equihgnn_tpu.data.synthetic import make_synthetic_dataset
from equihgnn_tpu.models.config import ModelConfig


def _batch(pack_slots, n=12, seed=3):
    samples = make_synthetic_dataset(n, seed=seed)
    spec = spec_for_samples(samples, batch_size=n)
    b = pad_hypergraph_batch(
        samples, spec, target=0, with_pos=True, pack_slots=pack_slots
    )
    return jax.tree.map(jnp.asarray, b)


def _strip_tables(b):
    return b.replace(
        hedge_row=None, hedge_slot=None, hedge_slot_index=None,
        hedge_slot_mask=None, inc_slot_atom=None, inc_slot_hedge=None,
        inc_slot_mask=None,
    )


def test_tables_present_and_consistent():
    for pack in (False, True):
        b = _batch(pack)
        slots = incidence_slots(b)
        assert slots is not None
        # every valid incidence entry maps to a valid (atom, hedge) slot pair
        im = np.asarray(b.inc_slot_mask)
        isa = np.asarray(b.inc_slot_atom)[im]
        ish = np.asarray(b.inc_slot_hedge)[im]
        rows = np.nonzero(im)[0] if im.ndim == 1 else np.where(im)[0]
        sm = np.asarray(b.slot_mask)
        hm = np.asarray(b.hedge_slot_mask)
        rr, _ = np.where(im)
        assert sm[rr, isa].all()
        assert hm[rr, ish].all()
        assert int(im.sum()) == int(np.asarray(b.inc_mask).sum())
        # hedge slot table round-trips to the flat hedge ids
        hr = np.asarray(b.hedge_row)
        hs = np.asarray(b.hedge_slot)
        hmask = np.asarray(b.hedge_mask)
        hsi = np.asarray(b.hedge_slot_index)
        np.testing.assert_array_equal(
            hsi[hr[hmask], hs[hmask]], np.nonzero(hmask)[0]
        )


@pytest.mark.parametrize("pack", [False, True])
@pytest.mark.parametrize("name", ["mhnns", "mhnn", "mhnnm"])
def test_dense_matches_flat(name, pack):
    b = _batch(pack)
    model = create_model(
        name, num_target=1,
        cfg=ModelConfig(mlp_hidden=16, output_hidden=8),
    )
    variables = model.init(jax.random.PRNGKey(0), b, deterministic=True)
    o_dense = model.apply(variables, b, deterministic=True)
    o_flat = model.apply(variables, _strip_tables(b), deterministic=True)
    m = np.asarray(b.graph_mask)
    np.testing.assert_allclose(
        np.asarray(o_dense)[m], np.asarray(o_flat)[m], rtol=2e-4, atol=2e-5
    )


def test_dense_matches_flat_batchnorm_training():
    """BN statistics are computed over masked incidence entries — the dense
    [R, Ni] layout must produce the same batch stats as the flat [nnz] one
    (training mode, mutable batch_stats)."""
    b = _batch(True)
    model = create_model(
        "mhnnm", num_target=1,
        cfg=ModelConfig(mlp_hidden=16, output_hidden=8, normalization="bn"),
    )
    variables = model.init(jax.random.PRNGKey(0), b, deterministic=True)
    kw = dict(
        deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )
    o_dense, st_d = model.apply(variables, b, **kw)
    o_flat, st_f = model.apply(variables, _strip_tables(b), **kw)
    m = np.asarray(b.graph_mask)
    np.testing.assert_allclose(
        np.asarray(o_dense)[m], np.asarray(o_flat)[m], rtol=5e-4, atol=5e-5
    )
    for vd, vf in zip(
        jax.tree_util.tree_leaves(st_d), jax.tree_util.tree_leaves(st_f)
    ):
        np.testing.assert_allclose(
            np.asarray(vd), np.asarray(vf), rtol=5e-4, atol=5e-5
        )


def test_overflow_falls_back_to_flat():
    """Rows that exceed the spec's hedge/incidence capacities must yield a
    batch WITHOUT tables (flat segment path), not a corrupt one."""
    import dataclasses

    samples = make_synthetic_dataset(8, seed=9)
    spec = spec_for_samples(samples, batch_size=8)
    tight = dataclasses.replace(spec, num_hedge_slots=1, num_inc_slots=1)
    b = pad_hypergraph_batch(samples, tight, target=0, with_pos=True,
                             pack_slots=True)
    assert incidence_slots(b) is None
    model = create_model(
        "mhnns", num_target=1, cfg=ModelConfig(mlp_hidden=16, output_hidden=8)
    )
    bj = jax.tree.map(jnp.asarray, b)
    variables = model.init(jax.random.PRNGKey(0), bj, deterministic=True)
    out = model.apply(variables, bj, deterministic=True)
    assert np.all(np.isfinite(np.asarray(out)))
