"""remat (reversible-sequence equivalent): grads finite + outputs identical."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from equihgnn_tpu import create_model
from equihgnn_tpu.data.batching import pad_hypergraph_batch, spec_for_samples
from equihgnn_tpu.data.synthetic import make_synthetic_dataset
from equihgnn_tpu.models.config import ModelConfig

MODELS = [
    "egnn_equihnns", "visnet_equihnns", "faformer_equihnns",
    "equiformer_equihnns", "se3_transformer_equihnns",
]


@pytest.mark.parametrize("name", MODELS)
def test_remat_matches_plain(name):
    samples = make_synthetic_dataset(5, seed=6, min_atoms=6)
    spec = spec_for_samples(samples, batch_size=5)
    b = jax.tree.map(
        jnp.asarray, pad_hypergraph_batch(samples, spec, target=0, with_pos=True)
    )
    m0 = create_model(name, num_target=1,
                      cfg=ModelConfig(mlp_hidden=16, output_hidden=8))
    m1 = create_model(name, num_target=1,
                      cfg=ModelConfig(mlp_hidden=16, output_hidden=8, remat=True))
    v = m0.init(jax.random.PRNGKey(0), b, deterministic=True)
    o0 = m0.apply(v, b, deterministic=True)
    o1 = m1.apply(v, b, deterministic=True)
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1), rtol=1e-5, atol=1e-6)

    g0 = jax.grad(lambda p: jnp.sum(m0.apply({"params": p}, b, deterministic=True) ** 2))(v["params"])
    g1 = jax.grad(lambda p: jnp.sum(m1.apply({"params": p}, b, deterministic=True) ** 2))(v["params"])
    for a, c in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-4, atol=1e-5)
