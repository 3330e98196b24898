"""FAFormer: frame-averaging correctness and equivariance."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.stats import ortho_group

from equihgnn_tpu.data.batching import pad_hypergraph_batch, spec_for_samples
from equihgnn_tpu.data.synthetic import make_synthetic_dataset
from equihgnn_tpu.nn.faformer import FAFormer, create_frame, invert_frame


def _batch(n=5, seed=0):
    samples = make_synthetic_dataset(n, seed=seed, min_atoms=6)
    spec = spec_for_samples(samples, batch_size=n)
    b = pad_hypergraph_batch(samples, spec, target=0, with_pos=True)
    return jax.tree.map(jnp.asarray, b)


def test_frame_roundtrip(rng):
    """invert_frame(create_frame(X)) == X for the identity payload."""
    coords = jnp.asarray(rng.standard_normal((4, 10, 3)).astype(np.float32))
    mask = jnp.asarray(np.ones((4, 10), bool))
    h, f_ops, center = create_frame(coords, mask)
    back = invert_frame(h, mask, f_ops, center)
    np.testing.assert_allclose(np.asarray(back), np.asarray(coords), atol=1e-4)


def test_frame_projection_invariant_under_rotation(rng):
    """Frame-projected coordinates are (up to frame permutation/sign) rotation
    invariant: the SET of 8 projections is preserved. We check the weaker,
    sufficient property used by the model: mean over frames of any symmetric
    function is invariant."""
    coords = rng.standard_normal((2, 12, 3)).astype(np.float32)
    mask = np.ones((2, 12), bool)
    R = ortho_group.rvs(3, random_state=3)
    R = R * np.sign(np.linalg.det(R))
    h1, _, _ = create_frame(jnp.asarray(coords), jnp.asarray(mask))
    h2, _, _ = create_frame(jnp.asarray(coords @ R.T), jnp.asarray(mask))
    # symmetric function: sorted squared-norm spectrum per point over frames
    f1 = np.sort(np.linalg.norm(np.asarray(h1), axis=-1), axis=1)
    f2 = np.sort(np.linalg.norm(np.asarray(h2), axis=-1), axis=1)
    np.testing.assert_allclose(f1, f2, rtol=1e-3, atol=1e-4)


def _apply(b, model, params=None, pos=None):
    pos = b.pos if pos is None else pos
    args = (b.atom_feat.astype(jnp.float32) @ jnp.ones((9, 16)) * 0.01, pos,
            b.atom_graph_id, b.slot_index, b.slot_mask, b.atom_slot)
    if params is None:
        params = model.init(jax.random.PRNGKey(0), *args, deterministic=True)
    return params, model.apply(params, *args, deterministic=True)


def test_faformer_invariance_and_equivariance():
    b = _batch()
    model = FAFormer(d_input=16, d_model=16, d_edge_model=16, n_layers=2,
                     n_heads=2, n_neighbors=6, valid_radius=1e6,
                     activation="swiglu")
    params, (tok1, geo1) = _apply(b, model)
    R = ortho_group.rvs(3, random_state=5)
    R = R * np.sign(np.linalg.det(R))
    t = np.array([2.0, -3.0, 1.0], np.float32)
    pos2 = jnp.asarray((np.asarray(b.pos) @ R.T + t).astype(np.float32))
    _, (tok2, geo2) = _apply(b, model, params=params, pos=pos2)
    m = np.asarray(b.atom_mask)
    # scalars invariant
    np.testing.assert_allclose(
        np.asarray(tok1)[m], np.asarray(tok2)[m], rtol=2e-2, atol=2e-3
    )
    # coordinates equivariant
    np.testing.assert_allclose(
        np.asarray(geo1)[m] @ R.T + t, np.asarray(geo2)[m], rtol=2e-2, atol=2e-3
    )


def test_faformer_models_forward():
    from equihgnn_tpu import create_model
    from equihgnn_tpu.models.config import ModelConfig

    b = _batch()
    cfg = ModelConfig(mlp_hidden=16, output_hidden=8)
    for name in ["faformer_equihnn", "faformer_equihnns", "faformer_equihnnm"]:
        model = create_model(name, num_target=1, cfg=cfg)
        variables = model.init(jax.random.PRNGKey(0), b, deterministic=True)
        out = model.apply(variables, b, deterministic=True)
        assert out.shape == (b.num_graphs,)
        assert np.all(np.isfinite(np.asarray(out)))
