"""L2DistAttention variant: equivariance + forward."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.stats import ortho_group

from equihgnn_tpu.data.batching import pad_hypergraph_batch, spec_for_samples
from equihgnn_tpu.data.synthetic import make_synthetic_dataset
from equihgnn_tpu.nn.equiformer import Equiformer


def test_l2_attention_invariance():
    samples = make_synthetic_dataset(5, seed=1, min_atoms=6)
    spec = spec_for_samples(samples, batch_size=5)
    b = jax.tree.map(
        jnp.asarray, pad_hypergraph_batch(samples, spec, target=0, with_pos=True)
    )
    model = Equiformer(dim=(16, 16), dim_in=(16,), heads=2, depth=1, dim_head=8,
                       valid_radius=1e6, num_neighbors=6, l2_dist_attention=True)
    feats = jax.random.normal(jax.random.PRNGKey(7), (b.num_atoms, 16)) * 0.3
    args = (feats, b.pos, b.atom_graph_id, b.slot_index, b.slot_mask, b.atom_slot)
    params = model.init(jax.random.PRNGKey(0), *args)
    t0a, _ = model.apply(params, *args)
    R = ortho_group.rvs(3, random_state=2)
    R = R * np.sign(np.linalg.det(R))
    pos2 = jnp.asarray(
        (np.asarray(b.pos) @ R.T + np.array([1.0, 2.0, 3.0])).astype(np.float32)
    )
    t0b, _ = model.apply(
        params, feats, pos2, b.atom_graph_id, b.slot_index, b.slot_mask,
        b.atom_slot,
    )
    m = np.asarray(b.atom_mask)
    np.testing.assert_allclose(
        np.asarray(t0a)[m], np.asarray(t0b)[m], rtol=1e-3, atol=1e-4
    )
