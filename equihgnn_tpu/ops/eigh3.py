"""Closed-form eigendecomposition of batched symmetric 3×3 matrices.

`jnp.linalg.eigh` lowers to an iterative LAPACK-style algorithm that costs
~82 ms for a [24k, 3, 3] batch on the v5e — and FAFormer's frame averaging
calls it ~10× per step (`reference fa_former_layer.py:100-102`), making it
the single hottest op. The trigonometric method (Smith 1961) + cross-product
eigenvectors is pure vectorized elementwise math on the VPU.

Convention matches `jnp.linalg.eigh`: eigenvalues ascending, eigenvectors as
COLUMNS (v_j = vecs[..., :, j]), orthonormal. Signs are arbitrary — callers
(frame averaging) enumerate all 2³ sign flips, so sign differences vs LAPACK
are immaterial.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-20


def _cross(a, b):
    return jnp.stack(
        [
            a[..., 1] * b[..., 2] - a[..., 2] * b[..., 1],
            a[..., 2] * b[..., 0] - a[..., 0] * b[..., 2],
            a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0],
        ],
        axis=-1,
    )


def eigvalsh3x3(A):
    """Ascending eigenvalues of symmetric [..., 3, 3] (trigonometric method)."""
    a00, a11, a22 = A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]
    a01, a02, a12 = A[..., 0, 1], A[..., 0, 2], A[..., 1, 2]
    q = (a00 + a11 + a22) / 3.0
    p1 = a01**2 + a02**2 + a12**2
    p2 = (a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, _EPS))
    b00, b11, b22 = (a00 - q) / p, (a11 - q) / p, (a22 - q) / p
    b01, b02, b12 = a01 / p, a02 / p, a12 / p
    detb = (
        b00 * (b11 * b22 - b12 * b12)
        - b01 * (b01 * b22 - b12 * b02)
        + b02 * (b01 * b12 - b11 * b02)
    )
    r = jnp.clip(detb / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    two_pi_3 = 2.0943951023931953
    lam_hi = q + 2.0 * p * jnp.cos(phi)
    lam_lo = q + 2.0 * p * jnp.cos(phi + two_pi_3)
    lam_mid = 3.0 * q - lam_hi - lam_lo
    iso = p2 < 1e-12 * jnp.maximum(q * q, 1.0)  # (near-)isotropic: all = q
    lam = jnp.stack([lam_lo, lam_mid, lam_hi], axis=-1)
    return jnp.where(iso[..., None], q[..., None], lam)


def _eigvec(A, lam, fallback):
    """Null-space direction of (A − λI) via the largest row-pair cross."""
    M = A - lam[..., None, None] * jnp.eye(3, dtype=A.dtype)
    c01 = _cross(M[..., 0, :], M[..., 1, :])
    c02 = _cross(M[..., 0, :], M[..., 2, :])
    c12 = _cross(M[..., 1, :], M[..., 2, :])
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    best = jnp.where(
        (n01 >= n02)[..., None] & (n01 >= n12)[..., None],
        c01,
        jnp.where((n02 >= n12)[..., None], c02, c12),
    )
    nbest = jnp.maximum(n01, jnp.maximum(n02, n12))
    # degenerate eigenvalue → any vector ⊥ the other eigvecs works; use the
    # fallback (orthogonalized against nothing here, fixed by caller)
    v = jnp.where((nbest > _EPS)[..., None], best, fallback)
    return v / jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), _EPS))


def eigh3x3(A):
    """(eigenvalues ascending [..., 3], eigenvectors as columns [..., 3, 3])."""
    lam = eigvalsh3x3(A)
    ex = jnp.broadcast_to(
        jnp.asarray([1.0, 0.0, 0.0], A.dtype), A.shape[:-2] + (3,)
    )
    # extreme eigenvalues are the best separated → most stable null spaces
    v0 = _eigvec(A, lam[..., 0], ex)
    v2 = _eigvec(A, lam[..., 2], ex)
    # re-orthogonalize v2 against v0 (safe under near-degeneracy), then the
    # middle vector completes the right-handed orthonormal basis
    v2 = v2 - jnp.sum(v2 * v0, axis=-1, keepdims=True) * v0
    n2 = jnp.sum(v2 * v2, axis=-1, keepdims=True)
    alt = _cross(v0, jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], A.dtype), v0.shape))
    v2 = jnp.where(n2 > 1e-12, v2 / jnp.sqrt(jnp.maximum(n2, _EPS)), alt)
    v2 = v2 / jnp.sqrt(jnp.maximum(jnp.sum(v2 * v2, -1, keepdims=True), _EPS))
    v1 = _cross(v2, v0)
    return lam, jnp.stack([v0, v1, v2], axis=-1)
