"""Gradient-finiteness regression: one train step of every 3-D model must
produce finite gradients (padded zero-vectors previously produced NaN through
L2-norm gradients — the safe_norm fix)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from equihgnn_tpu import create_model
from equihgnn_tpu.data.batching import pad_hypergraph_batch, spec_for_samples
from equihgnn_tpu.data.synthetic import make_synthetic_dataset
from equihgnn_tpu.models.config import ModelConfig

MODELS_3D = [
    "egnn_equihnns",
    "visnet_equihnns",
    "faformer_equihnns",
    "equiformer_equihnns",
    "se3_transformer_equihnns",
]


@pytest.mark.parametrize("name", MODELS_3D)
def test_grads_finite(name):
    samples = make_synthetic_dataset(6, seed=3)
    spec = spec_for_samples(samples, batch_size=6)
    b = jax.tree.map(
        jnp.asarray, pad_hypergraph_batch(samples, spec, target=0, with_pos=True)
    )
    model = create_model(
        name, num_target=1, cfg=ModelConfig(mlp_hidden=16, output_hidden=8)
    )
    variables = model.init(jax.random.PRNGKey(0), b, deterministic=True)

    def loss(p):
        out = model.apply(
            {"params": p}, b, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)}
        )
        m = b.graph_mask.astype(out.dtype)
        return jnp.sum((out - b.y) ** 2 * m) / jnp.maximum(jnp.sum(m), 1.0)

    l, g = jax.value_and_grad(loss)(variables["params"])
    assert np.isfinite(float(l))
    flat = jax.tree.leaves(g)
    for leaf in flat:
        assert np.all(np.isfinite(np.asarray(leaf))), name
