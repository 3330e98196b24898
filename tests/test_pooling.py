"""GNN_2D pooling modes incl. attention and set2set."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from equihgnn_tpu import create_model
from equihgnn_tpu.data.batching import pad_graph_batch, spec_for_samples
from equihgnn_tpu.data.synthetic import make_synthetic_dataset
from equihgnn_tpu.models.config import ModelConfig


@pytest.mark.parametrize("pooling", ["sum", "mean", "max", "attention", "set2set"])
def test_gnn2d_pooling_modes(pooling):
    samples = make_synthetic_dataset(6, seed=4, hyper=False)
    spec = spec_for_samples(samples, batch_size=6)
    b = jax.tree.map(jnp.asarray, pad_graph_batch(samples, spec, target=0))
    cfg = ModelConfig(
        mlp_hidden=16, output_hidden=8, gnn_emb_dim=16, gnn_num_layer=2,
        gnn_graph_pooling=pooling,
    )
    model = create_model("gin", num_target=1, cfg=cfg, gnn_type="gin")
    variables = model.init(jax.random.PRNGKey(0), b, deterministic=True)
    out = model.apply(variables, b, deterministic=True)
    assert out.shape == (b.num_graphs,)
    assert np.all(np.isfinite(np.asarray(out)))
