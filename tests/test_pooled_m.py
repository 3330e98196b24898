"""Pallas pooled-M kernel ≡ the einsum it replaces (fwd + grads)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from equihgnn_tpu.ops.pallas.pooled_m import pooled_m, pooled_m_supported


def _ref(h, tc):
    return jnp.einsum(
        "gakf,gakx->gaxf", h.astype(jnp.float32), tc.astype(jnp.float32)
    )


@pytest.mark.quick
@pytest.mark.parametrize("a", [8, 11])
def test_pooled_m_forward(a):
    rng = np.random.default_rng(0)
    g, k, x, f = 3, 16, 12, 128
    h = jnp.asarray(rng.normal(size=(g, a, k, f)).astype(np.float32))
    tc = jnp.asarray(rng.normal(size=(g, a, k, x)).astype(np.float32))
    assert pooled_m_supported(k, x, f)
    out = jax.jit(pooled_m)(h, tc)
    np.testing.assert_allclose(out, _ref(h, tc), rtol=1e-5, atol=1e-5)


@pytest.mark.quick
def test_pooled_m_grads():
    rng = np.random.default_rng(1)
    g, a, k, x, f = 2, 8, 16, 9, 128
    h = jnp.asarray(rng.normal(size=(g, a, k, f)).astype(np.float32))
    tc = jnp.asarray(rng.normal(size=(g, a, k, x)).astype(np.float32))
    co = jnp.asarray(rng.normal(size=(g, a, x, f)).astype(np.float32))

    loss = lambda fn: lambda h, tc: jnp.sum(fn(h, tc) * co)
    gh, gt = jax.jit(jax.grad(loss(pooled_m), argnums=(0, 1)))(h, tc)
    rh, rt = jax.grad(loss(_ref), argnums=(0, 1))(h, tc)
    np.testing.assert_allclose(gh, rh, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(gt, rt, rtol=1e-5, atol=1e-5)


def test_pooled_m_bf16():
    rng = np.random.default_rng(2)
    g, a, k, x, f = 2, 8, 16, 6, 128
    h = jnp.asarray(rng.normal(size=(g, a, k, f)).astype(np.float32))
    tc = jnp.asarray(rng.normal(size=(g, a, k, x)).astype(np.float32))
    out = jax.jit(pooled_m)(h.astype(jnp.bfloat16), tc.astype(jnp.bfloat16))
    # emitted in the input dtype (f32 accumulation inside the dot)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        out.astype(jnp.float32), _ref(h, tc), rtol=0.1, atol=0.15
    )
