"""Runtime real spherical harmonics (JAX, jit-friendly, any degree).

Replaces the reference's recursive associated-Legendre implementation with a
global memo cache (`reference equihgnn/models/layers/se3_transformer/
spherical_harmonics.py:41-114`): here Y_l is built by the CG recursion
Y_l ∝ Q^{(l-1,1,l)} (Y_{l-1} ⊗ Y_1) with host-precomputed CG constants —
pure einsums, fused by XLA, equivariant against `ops.so3.wigner_d_rotation`
by construction. Component normalization: ‖Y_l(r̂)‖ = √(2l+1).
"""

from __future__ import annotations

from functools import lru_cache
from math import sqrt

import jax.numpy as jnp
import numpy as np

from equihgnn_tpu.ops.so3 import real_clebsch_gordan, sh_norm_constants


@lru_cache(maxsize=None)
def _cg_const(l1: int, l2: int, l3: int) -> np.ndarray:
    return real_clebsch_gordan(l1, l2, l3).astype(np.float32)


def spherical_harmonics(lmax: int, vec, normalize: bool = True):
    """vec [..., 3] → list of [..., 2l+1] arrays for l = 0..lmax.

    With `normalize`, input vectors are unit-normalized first (zero vectors
    map to zero SH for l ≥ 1 — the convention ViSNet/SE3-T rely on for
    self-edges).
    """
    v = vec
    if normalize:
        # safe norm: zero vectors map to zero with a defined gradient
        n = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True) + 1e-24)
        v = jnp.where(n > 1e-10, v / n, 0.0)
    ys = [jnp.ones(v.shape[:-1] + (1,), dtype=v.dtype)]
    if lmax == 0:
        return ys
    y1 = v[..., jnp.array([1, 2, 0])] * sqrt(3.0)  # (y, z, x) basis
    ys.append(y1)
    consts = sh_norm_constants(lmax)
    for l in range(2, lmax + 1):
        Q = jnp.asarray(_cg_const(l - 1, 1, l))
        y = jnp.einsum("abc,...a,...b->...c", Q, ys[l - 1], y1)
        ys.append(y * consts[l])
    return ys


def spherical_harmonics_concat(lmax: int, vec, normalize: bool = True):
    """Concatenated [..., (lmax+1)²] layout."""
    return jnp.concatenate(spherical_harmonics(lmax, vec, normalize), axis=-1)
