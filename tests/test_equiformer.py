"""Equiformer: type-0 invariance, type-1 equivariance, model forward."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.stats import ortho_group

from equihgnn_tpu.data.batching import pad_hypergraph_batch, spec_for_samples
from equihgnn_tpu.data.synthetic import make_synthetic_dataset
from equihgnn_tpu.nn.equiformer import Equiformer
from equihgnn_tpu.ops.so3 import wigner_d_rotation


def _batch(n=5, seed=0):
    samples = make_synthetic_dataset(n, seed=seed, min_atoms=6)
    spec = spec_for_samples(samples, batch_size=n)
    b = pad_hypergraph_batch(samples, spec, target=0, with_pos=True)
    return jax.tree.map(jnp.asarray, b)


def _model():
    return Equiformer(dim=(16, 16), dim_in=(16,), heads=1, depth=1,
                      dim_head=8, valid_radius=1e6, num_neighbors=6)


def _feats(b, d=16):
    k = jax.random.PRNGKey(7)
    return jax.random.normal(k, (b.num_atoms, d)) * 0.3


def test_equiformer_equivariance():
    b = _batch()
    model = _model()
    feats = _feats(b)
    args = (feats, b.pos, b.atom_graph_id, b.slot_index, b.slot_mask, b.atom_slot)
    params = model.init(jax.random.PRNGKey(0), *args)
    t0_a, t1_a = model.apply(params, *args)

    R = ortho_group.rvs(3, random_state=11)
    R = R * np.sign(np.linalg.det(R))
    t = np.array([1.0, -2.0, 0.5], np.float32)
    pos2 = jnp.asarray((np.asarray(b.pos) @ R.T + t).astype(np.float32))
    t0_b, t1_b = model.apply(
        params, feats, pos2, b.atom_graph_id, b.slot_index, b.slot_mask,
        b.atom_slot,
    )
    m = np.asarray(b.atom_mask)
    # type-0 invariant
    np.testing.assert_allclose(
        np.asarray(t0_a)[m], np.asarray(t0_b)[m], rtol=1e-3, atol=1e-4
    )
    # type-1 equivariant: v' = v @ D1ᵀ
    D1 = wigner_d_rotation(1, R).astype(np.float32)
    want = np.einsum("ndm,cm->ndc", np.asarray(t1_a)[m], D1)
    np.testing.assert_allclose(want, np.asarray(t1_b)[m], rtol=1e-3, atol=1e-4)


def test_equiformer_no_cross_molecule_leakage():
    b = _batch()
    model = _model()
    feats = _feats(b)
    args = (feats, b.pos, b.atom_graph_id, b.slot_index, b.slot_mask, b.atom_slot)
    params = model.init(jax.random.PRNGKey(0), *args)
    t0_a, _ = model.apply(params, *args)
    gid = np.asarray(b.atom_graph_id)
    pos2 = np.asarray(b.pos).copy()
    pos2[gid == 1] += 700.0
    t0_b, _ = model.apply(
        params, feats, jnp.asarray(pos2), b.atom_graph_id, b.slot_index,
        b.slot_mask, b.atom_slot,
    )
    sel = (gid == 0) & np.asarray(b.atom_mask)
    np.testing.assert_allclose(
        np.asarray(t0_a)[sel], np.asarray(t0_b)[sel], rtol=1e-4, atol=1e-5
    )


def test_equiformer_model_forward():
    from equihgnn_tpu import create_model
    from equihgnn_tpu.models.config import ModelConfig

    b = _batch()
    model = create_model(
        "equiformer_equihnns", num_target=1,
        cfg=ModelConfig(mlp_hidden=16, output_hidden=8),
    )
    variables = model.init(jax.random.PRNGKey(0), b, deterministic=True)
    out = model.apply(variables, b, deterministic=True)
    assert out.shape == (b.num_graphs,)
    assert np.all(np.isfinite(np.asarray(out)))
