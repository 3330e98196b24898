"""Fused ViS_MP vector-interaction Pallas kernel vs the XLA composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from equihgnn_tpu.ops.pallas.vis_mix import (
    _mix_edge,
    _mix_last,
    _xla_mix,
    vis_mix_supported,
)

pytestmark = pytest.mark.quick


def _assert_close_norm(a, b, tol, name=""):
    """Norm-wise relative error: robust to bf16 product rounding on single
    elements (the kernel's MXU operands are bf16, like XLA's own DEFAULT
    precision on TPU — the f32 CPU reference is stricter than either)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    err = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9)
    assert err < tol, f"{name}: normwise rel err {err:.3e} >= {tol}"



def _inputs(g=3, a=8, k=5, L=8, h=16, seed=0):
    # values pre-quantized to the bf16 grid: the kernel's MXU matmuls run
    # bf16 operands (the production sub-f32 path), so the gather selections
    # stay EXACT on bf16-representable inputs; product terms (backward) still
    # round — grad tolerances account for that
    rng = np.random.default_rng(seed)
    q = lambda x: jnp.asarray(x, jnp.bfloat16).astype(jnp.float32)  # noqa: E731
    vec = q(rng.standard_normal((g, a, L, h)))
    s1 = q(rng.standard_normal((g, a, k, h)))
    s2m = q(rng.standard_normal((g, a, k, h)))
    d = q(rng.standard_normal((g, a, k, L)))
    idx = jnp.asarray(rng.integers(0, a, (g, a, k)), jnp.int32)
    mask = jnp.asarray(rng.random((g, a, k)) > 0.25)
    u = q(rng.standard_normal((g, a, L, h)))
    vv = q(rng.standard_normal((g, a, L, h)))
    return vec, s1, s2m, d, idx, mask, u, vv


def test_forward_edge_matches_xla():
    vec, s1, s2m, d, idx, mask, u, vv = _inputs()
    va, wd = _mix_edge(vec, s1, s2m, d, idx, mask, u, vv)
    va_r, wd_r = _xla_mix(vec, s1, s2m, d, idx, mask, u, vv)
    np.testing.assert_allclose(np.asarray(va), np.asarray(va_r),
                               atol=1e-2, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(wd), np.asarray(wd_r),
                               atol=1e-2, rtol=1e-2)


def test_forward_last_matches_xla():
    vec, s1, s2m, d, idx, mask, _, _ = _inputs(seed=1)
    va = _mix_last(vec, s1, s2m, d, idx, mask)
    va_r, _ = _xla_mix(vec, s1, s2m, d, idx, mask)
    np.testing.assert_allclose(np.asarray(va), np.asarray(va_r),
                               atol=1e-2, rtol=1e-2)


def test_backward_edge_matches_xla():
    # linear loss -> exact cotangents: w_dot values grow with L and a
    # nonlinear loss would amplify f32 reassociation noise chaotically
    vec, s1, s2m, d, idx, mask, u, vv = _inputs(seed=2)
    rng = np.random.default_rng(99)
    r1 = jnp.asarray(rng.standard_normal(vec.shape), jnp.float32)
    r2 = jnp.asarray(rng.standard_normal(s1.shape), jnp.float32)

    def loss_fused(vec, s1, s2m, d, u, vv):
        va, wd = _mix_edge(vec, s1, s2m, d, idx, mask, u, vv)
        return jnp.sum(va * r1) + jnp.sum(wd * r2)

    def loss_ref(vec, s1, s2m, d, u, vv):
        va, wd = _xla_mix(vec, s1, s2m, d, idx, mask, u, vv)
        return jnp.sum(va * r1) + jnp.sum(wd * r2)

    args = (vec, s1, s2m, d, u, vv)
    g1 = jax.grad(loss_fused, argnums=tuple(range(6)))(*args)
    g2 = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    for name, a_, b_ in zip(["vec", "s1", "s2m", "d", "u", "vv"], g1, g2):
        _assert_close_norm(a_, b_, 1e-2, name=f"grad {name}")


def test_backward_last_matches_xla():
    vec, s1, s2m, d, idx, mask, _, _ = _inputs(seed=3)
    r1 = jnp.asarray(
        np.random.default_rng(98).standard_normal(vec.shape), jnp.float32
    )

    def loss_fused(vec, s1, s2m, d):
        va = _mix_last(vec, s1, s2m, d, idx, mask)
        return jnp.sum(va * r1)

    def loss_ref(vec, s1, s2m, d):
        va, _ = _xla_mix(vec, s1, s2m, d, idx, mask)
        return jnp.sum(va * r1)

    args = (vec, s1, s2m, d)
    g1 = jax.grad(loss_fused, argnums=tuple(range(4)))(*args)
    g2 = jax.grad(loss_ref, argnums=tuple(range(4)))(*args)
    for name, a_, b_ in zip(["vec", "s1", "s2m", "d"], g1, g2):
        _assert_close_norm(a_, b_, 1e-2, name=f"grad {name}")


def test_bench_shape_supported():
    assert vis_mix_supported(32, 17, 8, 256)


def test_multi_h_block_accumulation():
    # h=256 spans two 128-lane grid blocks: the d-gradient accumulates into
    # a revisited output block across the inner h-grid
    vec, s1, s2m, d, idx, mask, u, vv = _inputs(g=2, a=8, k=5, h=256, seed=7)
    rng = np.random.default_rng(97)
    r1 = jnp.asarray(rng.standard_normal(vec.shape), jnp.float32)
    r2 = jnp.asarray(rng.standard_normal(s1.shape), jnp.float32)

    def loss(fn):
        def f(vec, s1, s2m, d, u, vv):
            va, wd = fn(vec, s1, s2m, d, idx, mask, u, vv)
            return jnp.sum(va * r1) + jnp.sum(wd * r2)
        return f

    args = (vec, s1, s2m, d, u, vv)
    o1 = _mix_edge(*args[:4], idx, mask, u, vv)
    o2 = _xla_mix(*args[:4], idx, mask, u, vv)
    for a_, b_ in zip(o1, o2):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   atol=2e-2, rtol=2e-2)
    g1 = jax.grad(loss(_mix_edge), argnums=tuple(range(6)))(*args)
    g2 = jax.grad(loss(_xla_mix), argnums=tuple(range(6)))(*args)
    for name, a_, b_ in zip(["vec", "s1", "s2m", "d", "u", "vv"], g1, g2):
        _assert_close_norm(a_, b_, 1e-2, name=f"grad {name}")


def test_bf16_dtype_roundtrip():
    vec, s1, s2m, d, idx, mask, u, vv = (
        t.astype(jnp.bfloat16) if t.dtype == jnp.float32 else t
        for t in _inputs(seed=4)
    )
    va, wd = _mix_edge(vec, s1, s2m, d, idx, mask, u, vv)
    assert va.dtype == jnp.bfloat16 and wd.dtype == jnp.bfloat16
    va_r, wd_r = _xla_mix(
        *(t.astype(jnp.float32) if t.dtype == jnp.bfloat16 else t
          for t in (vec, s1, s2m, d, idx, mask, u, vv))
    )
    np.testing.assert_allclose(np.asarray(va, np.float32), np.asarray(va_r),
                               atol=0.1, rtol=0.1)
    np.testing.assert_allclose(np.asarray(wd, np.float32), np.asarray(wd_r),
                               atol=0.2, rtol=0.2)
