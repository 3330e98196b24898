"""Fused frame-averaged SwiGLU Pallas kernel vs the materialized-frame chain.

Covers the kernel itself (forward + all gradients vs an XLA reference that
expands the 8 sign frames), `create_frame_basis` vs `create_frame`, and the
full `_FrameSwiGLU` module vs the `_SwiGLU(mean_axis=...)` path it replaces
(identical parameter trees, so one set of params drives both).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from equihgnn_tpu.nn.faformer import (
    _SIGN_OPS,
    _FrameSwiGLU,
    _SwiGLU,
    create_frame,
    create_frame_basis,
)
from equihgnn_tpu.ops.pallas.frame_swiglu import (
    frame_swiglu_supported,
    fused_frame_swiglu,
)

pytestmark = pytest.mark.quick

_LN_EPS = 1e-5


def _xla_reference(x, w1, b1, ls, lb):
    c = x.shape[-1]
    sgn = np.concatenate([_SIGN_OPS, np.ones((8, c - 3), np.float32)], -1)
    h = (x[:, None, :] * sgn) @ w1 + b1  # [P, 8, H]
    x1, x2 = jnp.split(h, 2, axis=-1)
    y = jax.nn.silu(x1) * x2
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean((y - mu) ** 2, axis=-1, keepdims=True)
    yn = (y - mu) * jax.lax.rsqrt(var + _LN_EPS) * ls + lb
    return jnp.mean(yn, axis=1)


def _inputs(p=37, c=4, h=32, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((p, c)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((c, h)) * 0.3, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(h) * 0.1, jnp.float32)
    ls = jnp.asarray(1.0 + 0.2 * rng.standard_normal(h // 2), jnp.float32)
    lb = jnp.asarray(0.1 * rng.standard_normal(h // 2), jnp.float32)
    return x, w1, b1, ls, lb


def test_forward_matches_xla():
    args = _inputs()
    out = fused_frame_swiglu(*args)
    ref = _xla_reference(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_backward_matches_xla():
    args = _inputs(p=21, c=5, h=64, seed=3)

    def loss(fn, *a):
        return jnp.sum(jnp.sin(fn(*a)))

    g1 = jax.grad(lambda *a: loss(fused_frame_swiglu, *a),
                  argnums=tuple(range(5)))(*args)
    g2 = jax.grad(lambda *a: loss(_xla_reference, *a),
                  argnums=tuple(range(5)))(*args)
    for a_, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)


def test_basis_matches_create_frame():
    rng = np.random.default_rng(7)
    coords = jnp.asarray(rng.standard_normal((3, 9, 3)), jnp.float32)
    mask = jnp.asarray(rng.random((3, 9)) > 0.25)
    h, _, center = create_frame(coords, mask)  # [3, 8, 9, 3]
    vbar, center_b = create_frame_basis(coords, mask)  # [3, 9, 3]
    signs = jnp.asarray(_SIGN_OPS)  # [8, 3]
    expanded = signs[None, :, None, :] * vbar[:, None, :, :]
    np.testing.assert_allclose(np.asarray(h), np.asarray(expanded), atol=1e-5)
    np.testing.assert_allclose(np.asarray(center), np.asarray(center_b),
                               atol=1e-6)


def test_basis_matches_create_frame_packed():
    rng = np.random.default_rng(8)
    r, p, b = 4, 6, 5
    coords = jnp.asarray(rng.standard_normal((r, p, 3)), jnp.float32)
    slot_gid = jnp.asarray(rng.integers(0, b, (r, p)), jnp.int32)
    mask = jnp.asarray(rng.random((r, p)) > 0.2)
    h, _, center = create_frame(coords, mask, slot_gid, b)  # [R, 8, P, 3]
    vbar, center_b = create_frame_basis(coords, mask, slot_gid, b)
    signs = jnp.asarray(_SIGN_OPS)
    expanded = jnp.einsum("oi,rpi->ropi", signs, vbar)
    np.testing.assert_allclose(np.asarray(h), np.asarray(expanded), atol=1e-5)
    np.testing.assert_allclose(np.asarray(center), np.asarray(center_b),
                               atol=1e-6)


def test_module_matches_swiglu_path():
    """_FrameSwiGLU(vbar) ≡ _SwiGLU(materialized frames, mean_axis) with the
    same params (identical tree: fc1/norm/fc2)."""
    rng = np.random.default_rng(11)
    p, c, hidden, out = 14, 4, 32, 12
    x = jnp.asarray(rng.standard_normal((p, c)), jnp.float32)

    fused = _FrameSwiGLU(hidden, out, drop=0.0)
    params = fused.init(jax.random.PRNGKey(0), x)
    y_fused = fused.apply(params, x)

    sgn = jnp.concatenate(
        [jnp.asarray(_SIGN_OPS), jnp.ones((8, c - 3), jnp.float32)], -1
    )
    frames = x[:, None, :] * sgn  # [P, 8, C], frame axis at -2
    ref = _SwiGLU(hidden, out, drop=0.0, mean_axis=-2)
    y_ref = ref.apply(params, frames)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)


def test_bench_shape_supported():
    # EdgeModule coord_mlp at bench shapes: P = R·A·k, C = 4, hidden = 256
    assert frame_swiglu_supported(477 * 32 * 16, 4, 256)
    # FAFFN W_frame: P = R·A, C = 3
    assert frame_swiglu_supported(477 * 32, 3, 256)
