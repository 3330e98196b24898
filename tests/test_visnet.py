"""ViSNet: SH correctness, RBF shape, rotation invariance, model forward."""

import math

import jax
import jax.numpy as jnp
import numpy as np
from scipy.stats import ortho_group

from equihgnn_tpu.data.batching import pad_hypergraph_batch, spec_for_samples
from equihgnn_tpu.data.synthetic import make_synthetic_dataset
from equihgnn_tpu.nn.visnet import (
    ExpNormalSmearing,
    ViSNet,
    cosine_cutoff,
    spherical_harmonics_l2,
)


def _batch(n=6, seed=0):
    samples = make_synthetic_dataset(n, seed=seed)
    spec = spec_for_samples(samples, batch_size=n)
    b = pad_hypergraph_batch(samples, spec, target=0, with_pos=True)
    return jax.tree.map(jnp.asarray, b)


def test_cosine_cutoff_bounds():
    d = jnp.array([0.0, 2.5, 4.99, 5.0, 7.0])
    c = np.asarray(cosine_cutoff(d, 5.0))
    assert c[0] == 1.0 and c[3] == 0.0 and c[4] == 0.0
    assert 0 < c[1] < 1 and 0 < c[2] < 0.01


def test_spherical_harmonics_norm():
    """For unit vectors the l=1 block has norm 1; values match the hand
    formulas of `reference visnet_layer.py:160-193`."""
    rng = np.random.default_rng(0)
    v = rng.standard_normal((50, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    sh = np.asarray(spherical_harmonics_l2(jnp.asarray(v), 2))
    assert sh.shape == (50, 8)
    np.testing.assert_allclose(np.linalg.norm(sh[:, :3], axis=-1), 1.0, rtol=1e-5)
    x, y, z = v[:, 0], v[:, 1], v[:, 2]
    np.testing.assert_allclose(sh[:, 3], math.sqrt(3) * x * z, rtol=1e-5)
    np.testing.assert_allclose(sh[:, 5], y**2 - 0.5 * (x**2 + z**2), rtol=1e-4, atol=1e-6)


def test_rbf_values():
    rbf = ExpNormalSmearing(cutoff=5.0, num_rbf=8, trainable=False)
    out = rbf.apply({}, jnp.array([0.0, 2.0, 6.0]))
    out = np.asarray(out)
    assert out.shape == (3, 8)
    assert np.all(out[2] == 0)  # beyond cutoff
    assert np.all(out[:2] >= 0) and out[0].max() > 0.5


def _visnet_apply(b, feats_seed=0):
    model = ViSNet(hidden_channels=16, lmax=2, max_num_neighbors=16, num_layers=2)
    params = model.init(
        jax.random.PRNGKey(feats_seed), b.atom_feat, b.pos, b.atom_graph_id,
        b.slot_index, b.slot_mask, b.atom_slot,
    )
    out = model.apply(
        params, b.atom_feat, b.pos, b.atom_graph_id,
        b.slot_index, b.slot_mask, b.atom_slot,
    )
    return params, out


def test_visnet_rotation_translation_invariance():
    b = _batch()
    params, out1 = _visnet_apply(b)
    R = ortho_group.rvs(3, random_state=1)
    R = R * np.sign(np.linalg.det(R))
    pos2 = jnp.asarray(np.asarray(b.pos) @ R.T + np.array([3.0, -1.0, 2.0]))
    model = ViSNet(hidden_channels=16, lmax=2, max_num_neighbors=16, num_layers=2)
    out2 = model.apply(
        params, b.atom_feat, pos2, b.atom_graph_id,
        b.slot_index, b.slot_mask, b.atom_slot,
    )
    m = np.asarray(b.atom_mask)
    np.testing.assert_allclose(
        np.asarray(out1)[m], np.asarray(out2)[m], rtol=1e-3, atol=1e-4
    )


def test_visnet_no_cross_molecule_leakage():
    b = _batch()
    params, out1 = _visnet_apply(b)
    gid = np.asarray(b.atom_graph_id)
    pos2 = np.asarray(b.pos).copy()
    pos2[gid == 1] += 500.0
    model = ViSNet(hidden_channels=16, lmax=2, max_num_neighbors=16, num_layers=2)
    out2 = model.apply(
        params, b.atom_feat, jnp.asarray(pos2), b.atom_graph_id,
        b.slot_index, b.slot_mask, b.atom_slot,
    )
    sel = (gid == 0) & np.asarray(b.atom_mask)
    np.testing.assert_allclose(
        np.asarray(out1)[sel], np.asarray(out2)[sel], rtol=1e-4, atol=1e-5
    )


def test_visnet_models_forward():
    from equihgnn_tpu import create_model
    from equihgnn_tpu.models.config import ModelConfig

    b = _batch()
    cfg = ModelConfig(mlp_hidden=16, output_hidden=8)
    for name in ["visnet_equihnn", "visnet_equihnns", "visnet_equihnnm"]:
        model = create_model(name, num_target=1, cfg=cfg)
        variables = model.init(jax.random.PRNGKey(0), b, deterministic=True)
        out = model.apply(variables, b, deterministic=True)
        assert out.shape == (b.num_graphs,)
        assert np.all(np.isfinite(np.asarray(out)))
