"""EGNN equivariance / invariance properties."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.stats import ortho_group

from equihgnn_tpu.nn.egnn import EGNN


def _setup(rng, n=20, d=8):
    feats = rng.standard_normal((n, d)).astype(np.float32)
    coors = rng.standard_normal((n, 3)).astype(np.float32)
    mask = np.ones(n, dtype=bool)
    mask[-3:] = False
    gid = np.zeros(n, dtype=np.int32)
    gid[n // 2 :] = 1
    layer = EGNN(dim=d, num_nearest_neighbors=6, valid_radius=50.0)
    params = layer.init(
        jax.random.PRNGKey(0), jnp.asarray(feats), jnp.asarray(coors),
        mask=jnp.asarray(mask), graph_id=jnp.asarray(gid)
    )
    return layer, params, feats, coors, mask, gid


def test_rotation_translation_equivariance(rng):
    layer, params, feats, coors, mask, gid = _setup(rng)
    R = ortho_group.rvs(3, random_state=0)
    R = R * np.sign(np.linalg.det(R))  # proper rotation
    t = np.array([1.5, -2.0, 0.7])

    f1, c1 = layer.apply(params, jnp.asarray(feats), jnp.asarray(coors),
                         mask=jnp.asarray(mask), graph_id=jnp.asarray(gid))
    f2, c2 = layer.apply(params, jnp.asarray(feats),
                         jnp.asarray((coors @ R.T + t).astype(np.float32)),
                         mask=jnp.asarray(mask), graph_id=jnp.asarray(gid))
    # features invariant, coordinates equivariant
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(c1) @ R.T + t, np.asarray(c2), rtol=1e-3, atol=1e-4
    )


def test_no_cross_molecule_leakage(rng):
    """Moving molecule 2 far away must not change molecule 1's features."""
    layer, params, feats, coors, mask, gid = _setup(rng)
    coors2 = coors.copy()
    coors2[gid == 1] += 1000.0
    f1, _ = layer.apply(params, jnp.asarray(feats), jnp.asarray(coors),
                        mask=jnp.asarray(mask), graph_id=jnp.asarray(gid))
    f2, _ = layer.apply(params, jnp.asarray(feats), jnp.asarray(coors2),
                        mask=jnp.asarray(mask), graph_id=jnp.asarray(gid))
    sel = (gid == 0) & mask
    np.testing.assert_allclose(
        np.asarray(f1)[sel], np.asarray(f2)[sel], rtol=1e-4, atol=1e-5
    )


def test_padding_rows_do_not_affect_output(rng):
    layer, params, feats, coors, mask, gid = _setup(rng)
    feats2 = feats.copy()
    coors2 = coors.copy()
    feats2[~mask] = 99.0
    coors2[~mask] = -77.0
    f1, c1 = layer.apply(params, jnp.asarray(feats), jnp.asarray(coors),
                         mask=jnp.asarray(mask), graph_id=jnp.asarray(gid))
    f2, c2 = layer.apply(params, jnp.asarray(feats2), jnp.asarray(coors2),
                         mask=jnp.asarray(mask), graph_id=jnp.asarray(gid))
    np.testing.assert_allclose(np.asarray(f1)[mask], np.asarray(f2)[mask],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c1)[mask], np.asarray(c2)[mask],
                               rtol=1e-5, atol=1e-6)
