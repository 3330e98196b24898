"""compute_dtype=bfloat16: forward stays close to float32, grads finite."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from equihgnn_tpu import create_model
from equihgnn_tpu.data.batching import pad_hypergraph_batch, spec_for_samples
from equihgnn_tpu.data.synthetic import make_synthetic_dataset
from equihgnn_tpu.models.config import ModelConfig


@pytest.mark.parametrize(
    "name",
    ["mhnns", "egnn_equihnns", "se3_transformer_equihnns", "visnet_equihnns",
     "faformer_equihnns"],
)
def test_bf16_close_to_f32(name):
    samples = make_synthetic_dataset(6, seed=5)
    spec = spec_for_samples(samples, batch_size=6)
    b = jax.tree.map(
        jnp.asarray, pad_hypergraph_batch(samples, spec, target=0, with_pos=True)
    )
    cfg32 = ModelConfig(mlp_hidden=16, output_hidden=8)
    cfg16 = ModelConfig(mlp_hidden=16, output_hidden=8, compute_dtype="bfloat16")
    m32 = create_model(name, num_target=1, cfg=cfg32)
    m16 = create_model(name, num_target=1, cfg=cfg16)
    v = m32.init(jax.random.PRNGKey(0), b, deterministic=True)
    o32 = m32.apply(v, b, deterministic=True)
    o16 = m16.apply(v, b, deterministic=True)
    assert o16.dtype == jnp.float32  # predictions cast back
    mask = np.asarray(b.graph_mask)
    scale = np.abs(np.asarray(o32)[mask]).mean() + 1e-3
    assert np.abs(np.asarray(o32) - np.asarray(o16))[mask].max() / scale < 0.1

    def loss(p):
        out = m16.apply({"params": p}, b, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(1)})
        m = b.graph_mask.astype(out.dtype)
        return jnp.sum((out - b.y) ** 2 * m) / jnp.maximum(jnp.sum(m), 1.0)

    l, g = jax.value_and_grad(loss)(v["params"])
    assert np.isfinite(float(l))
    for leaf in jax.tree.leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))
