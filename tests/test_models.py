"""Forward-pass smoke + padding-invariance for every registered model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import equihgnn_tpu.models  # noqa: F401 — registration
from equihgnn_tpu import create_model
from equihgnn_tpu.common.registry import registry
from equihgnn_tpu.data.batching import BatchSpec, pad_graph_batch, pad_hypergraph_batch
from equihgnn_tpu.data.synthetic import make_synthetic_dataset
from equihgnn_tpu.models.config import ModelConfig

HYPER_MODELS = ["mhnn", "mhnns", "mhnnm", "egnn_equihnn", "egnn_equihnns", "egnn_equihnnm"]
GRAPH_MODELS = ["gin", "gcn", "gat", "gatv2"]

CFG = ModelConfig(mlp_hidden=16, output_hidden=8, gnn_emb_dim=16, gnn_num_layer=2)


def _to_jax(b):
    return jax.tree.map(jnp.asarray, b)


def _hyper_batch(spec=None, n=6, seed=0):
    samples = make_synthetic_dataset(n, seed=seed)
    spec = spec or BatchSpec(num_graphs=n + 1, num_atoms=256, num_hedges=256, nnz=512)
    return _to_jax(pad_hypergraph_batch(samples, spec, target=0, with_pos=True)), spec


def _graph_batch(spec=None, n=6, seed=0):
    samples = make_synthetic_dataset(n, seed=seed, hyper=False)
    spec = spec or BatchSpec(num_graphs=n + 1, num_atoms=256, num_hedges=512, nnz=512)
    return _to_jax(pad_graph_batch(samples, spec, target=0, with_pos=True)), spec


def _init_and_apply(model, batch):
    variables = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
    out = model.apply(variables, batch, deterministic=True)
    return variables, out


@pytest.mark.parametrize("name", HYPER_MODELS)
def test_hyper_model_forward(name):
    batch, _ = _hyper_batch()
    model = create_model(name, num_target=1, cfg=CFG)
    _, out = _init_and_apply(model, batch)
    assert out.shape == (batch.num_graphs,)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("name", GRAPH_MODELS)
def test_graph_model_forward(name):
    batch, _ = _graph_batch()
    model = create_model(name, num_target=1, cfg=CFG, gnn_type=name)
    _, out = _init_and_apply(model, batch)
    assert out.shape == (batch.num_graphs,)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("name", ["mhnn", "mhnns", "mhnnm", "egnn_equihnns"])
def test_padding_invariance(name):
    """Predictions on real graphs must not depend on padding capacity."""
    small = BatchSpec(num_graphs=7, num_atoms=200, num_hedges=200, nnz=400)
    big = BatchSpec(num_graphs=12, num_atoms=512, num_hedges=384, nnz=768)
    samples = make_synthetic_dataset(6, seed=7)
    b1 = _to_jax(pad_hypergraph_batch(samples, small, target=0, with_pos=True))
    b2 = _to_jax(pad_hypergraph_batch(samples, big, target=0, with_pos=True))
    model = create_model(name, num_target=1, cfg=CFG)
    variables = model.init(jax.random.PRNGKey(0), b1, deterministic=True)
    o1 = model.apply(variables, b1, deterministic=True)
    o2 = model.apply(variables, b2, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(o1)[:6], np.asarray(o2)[:6], rtol=2e-4, atol=2e-5
    )


def test_registry_has_reference_names():
    for name in HYPER_MODELS + GRAPH_MODELS:
        assert registry.get_model_class(name) is not None, name


def test_jit_compiles_once():
    batch, spec = _hyper_batch()
    model = create_model("mhnns", num_target=1, cfg=CFG)
    variables = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
    traces = 0

    @jax.jit
    def fwd(v, b):
        nonlocal traces
        traces += 1
        return model.apply(v, b, deterministic=True)

    fwd(variables, batch)
    batch2, _ = _hyper_batch(spec=spec, seed=1)
    fwd(variables, batch2)
    assert traces == 1
