"""SE(3)-Transformer: invariance of type-0 output, model forward."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.stats import ortho_group

from equihgnn_tpu.data.batching import pad_hypergraph_batch, spec_for_samples
from equihgnn_tpu.data.synthetic import make_synthetic_dataset
from equihgnn_tpu.nn.se3_transformer import SE3Transformer


def _batch(n=5, seed=0):
    samples = make_synthetic_dataset(n, seed=seed, min_atoms=6)
    spec = spec_for_samples(samples, batch_size=n)
    b = pad_hypergraph_batch(samples, spec, target=0, with_pos=True)
    return jax.tree.map(jnp.asarray, b)


def test_se3_transformer_invariance():
    b = _batch()
    model = SE3Transformer(dim=12, heads=2, depth=1, dim_head=6,
                           num_degrees=2, valid_radius=1e6, num_neighbors=6)
    feats = jax.random.normal(jax.random.PRNGKey(3), (b.num_atoms, 12)) * 0.3
    args = (feats, b.pos, b.atom_graph_id, b.slot_index, b.slot_mask, b.atom_slot)
    params = model.init(jax.random.PRNGKey(0), *args)
    out1 = model.apply(params, *args)

    R = ortho_group.rvs(3, random_state=21)
    R = R * np.sign(np.linalg.det(R))
    t = np.array([0.5, 1.5, -2.0], np.float32)
    pos2 = jnp.asarray((np.asarray(b.pos) @ R.T + t).astype(np.float32))
    out2 = model.apply(
        params, feats, pos2, b.atom_graph_id, b.slot_index, b.slot_mask,
        b.atom_slot,
    )
    m = np.asarray(b.atom_mask)
    np.testing.assert_allclose(
        np.asarray(out1)[m], np.asarray(out2)[m], rtol=1e-3, atol=1e-4
    )


def test_se3_model_forward():
    from equihgnn_tpu import create_model
    from equihgnn_tpu.models.config import ModelConfig

    b = _batch()
    model = create_model(
        "se3_transformer_equihnns", num_target=1,
        cfg=ModelConfig(mlp_hidden=16, output_hidden=8),
    )
    variables = model.init(jax.random.PRNGKey(0), b, deterministic=True)
    out = model.apply(variables, b, deterministic=True)
    assert out.shape == (b.num_graphs,)
    assert np.all(np.isfinite(np.asarray(out)))
