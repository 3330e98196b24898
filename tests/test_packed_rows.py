"""Row packing: packed [R, A] slot view must be numerically identical to the
per-molecule [G, A] view for every encoder that supports it."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from equihgnn_tpu import create_model
from equihgnn_tpu.data.batching import pad_hypergraph_batch, spec_for_samples
from equihgnn_tpu.data.synthetic import make_synthetic_dataset
from equihgnn_tpu.models.config import ModelConfig


def _batches(n=40, seed=11):
    # n large enough that bin-packing beats one-row-per-graph even after
    # the row count is rounded up to a multiple of 4 (the vis_mix kernels'
    # row block); at n=10 the alignment alone can cost the win
    samples = make_synthetic_dataset(n, seed=seed)
    spec = spec_for_samples(samples, batch_size=n)
    unpacked = pad_hypergraph_batch(samples, spec, target=0, with_pos=True)
    packed = pad_hypergraph_batch(
        samples, spec, target=0, with_pos=True, pack_slots=True
    )
    return (
        jax.tree.map(jnp.asarray, unpacked),
        jax.tree.map(jnp.asarray, packed),
        spec,
    )


def test_packing_reduces_rows():
    unpacked, packed, spec = _batches()
    assert packed.slot_index.shape[0] < unpacked.slot_index.shape[0]
    # all real atoms assigned, same molecule ids
    assert int(packed.slot_mask.sum()) == int(unpacked.atom_mask.sum())
    idx = np.where(np.asarray(packed.slot_mask))
    gids = np.asarray(packed.slot_gid)[idx]
    flat = np.asarray(packed.slot_index)[idx]
    np.testing.assert_array_equal(np.asarray(packed.atom_graph_id)[flat], gids)


@pytest.mark.parametrize(
    "name",
    ["egnn_equihnns", "visnet_equihnns", "equiformer_equihnns",
     "se3_transformer_equihnns", "faformer_equihnns"],
)
def test_packed_rows_match_unpacked(name):
    unpacked, packed, _ = _batches()
    model = create_model(
        name, num_target=1, cfg=ModelConfig(mlp_hidden=16, output_hidden=8)
    )
    variables = model.init(jax.random.PRNGKey(0), unpacked, deterministic=True)
    o1 = model.apply(variables, unpacked, deterministic=True)
    o2 = model.apply(variables, packed, deterministic=True)
    m = np.asarray(unpacked.graph_mask)
    np.testing.assert_allclose(
        np.asarray(o1)[m], np.asarray(o2)[m], rtol=2e-4, atol=2e-5
    )


def test_faformer_packed_frames_match():
    """Frame averaging on packed rows groups statistics by slot_gid; the
    per-molecule frames must equal the per-row computation exactly."""
    import numpy as np

    from equihgnn_tpu.nn.faformer import create_frame

    unpacked, packed, _ = _batches()
    h_u, _, _ = create_frame(unpacked.pos[unpacked.slot_index]
                             * unpacked.slot_mask[..., None],
                             unpacked.slot_mask)
    h_p, _, _ = create_frame(packed.pos[packed.slot_index]
                             * packed.slot_mask[..., None],
                             packed.slot_mask, packed.slot_gid,
                             packed.num_graphs)
    # compare per real atom: unpacked (gid row, slot) vs packed (row, slot)
    um = np.asarray(unpacked.slot_mask)
    gids = np.where(um)[0]
    slots = np.where(um)[1]
    pm = np.asarray(packed.slot_mask)
    prow, pslot = np.where(pm)
    pgid = np.asarray(packed.slot_gid)[prow, pslot]
    order_u = np.asarray(unpacked.slot_index)[gids, slots]
    order_p = np.asarray(packed.slot_index)[prow, pslot]
    hu = np.asarray(h_u)[gids[:, None], :, slots[:, None]][
        np.argsort(order_u)
    ]
    hp = np.asarray(h_p)[prow[:, None], :, pslot[:, None]][
        np.argsort(order_p)
    ]
    np.testing.assert_allclose(hu, hp, rtol=1e-4, atol=1e-5)
