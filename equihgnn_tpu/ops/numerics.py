"""Numerically-safe primitives for equivariant layers.

`jnp.linalg.norm` has a NaN gradient at exactly zero (0/0), and padded slots
in our static batches are exact zeros — clamping *after* the norm does not
help because XLA still evaluates the NaN branch (0 · NaN = NaN). `safe_norm`
is the smooth variant ‖x‖ ≈ √(Σx² + ε²) whose gradient is defined everywhere.
"""

from __future__ import annotations

import jax.numpy as jnp


def safe_norm(x, axis=-1, keepdims: bool = False, eps: float = 1e-12):
    return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims) + eps * eps)
