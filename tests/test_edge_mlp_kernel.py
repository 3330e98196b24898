"""Fused EGNN edge-MLP Pallas kernel vs the unfused XLA composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from equihgnn_tpu.ops.pallas.edge_mlp import (
    _xla_forward,
    fused_edge_messages,
)

pytestmark = pytest.mark.quick


def _inputs(g=3, a=8, k=4, f=34, m=6, seed=0):
    rng = np.random.default_rng(seed)
    ui = jnp.asarray(rng.standard_normal((g, a, f)), jnp.float32)
    ujn = jnp.asarray(rng.standard_normal((g, a, f)), jnp.float32)
    dist = jnp.asarray(rng.random((g, a, k)) * 4.0, jnp.float32)
    idx = jnp.asarray(rng.integers(0, a, (g, a, k)), jnp.int32)
    wd = jnp.asarray(rng.standard_normal(f) * 0.1, jnp.float32)
    b0 = jnp.asarray(rng.standard_normal(f) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((f, m)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(m) * 0.1, jnp.float32)
    return ui, ujn, dist, idx, wd, b0, w1, b1


def test_forward_matches_xla():
    args = _inputs()
    out = fused_edge_messages(*args)
    ref = _xla_forward(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_backward_matches_xla():
    args = _inputs(seed=3)
    idx = args[3]

    def loss_fused(ui, ujn, dist, wd, b0, w1, b1):
        out = fused_edge_messages(ui, ujn, dist, idx, wd, b0, w1, b1)
        return jnp.sum(jnp.sin(out))

    def loss_ref(ui, ujn, dist, wd, b0, w1, b1):
        out = _xla_forward(ui, ujn, dist, idx, wd, b0, w1, b1)
        return jnp.sum(jnp.sin(out))

    diff_args = args[:3] + args[4:]
    g1 = jax.grad(loss_fused, argnums=tuple(range(7)))(*diff_args)
    g2 = jax.grad(loss_ref, argnums=tuple(range(7)))(*diff_args)
    for a_, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)


def test_bench_shape_supported():
    from equihgnn_tpu.ops.pallas.edge_mlp import _supported

    assert _supported(32, 16, 1026, 16)
