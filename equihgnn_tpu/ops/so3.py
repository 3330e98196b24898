"""SO(3) representation math: real irreps, Clebsch-Gordan tensors, Wigner-D.

Host-side float64 precompute (cached), replacing BOTH of the reference's
mechanisms — the missing `J_dense.pt` Wigner-J blobs
(`reference equihgnn/models/layers/equiformer/irr_repr.py:10-32`,
`se3_transformer/irr_repr.py:18-26`) and the disk-cached float64 Sylvester
SVD solves for the equivariant basis Q_J
(`equiformer/basis.py:93-113`, `se3_transformer/basis.py:153-173`).

Construction (self-consistent by design, no phase conventions to match):
  1. l=1 real irrep fixed to the (y, z, x) vector basis: generators
     K_1 = P G Pᵀ of so(3).
  2. higher irreps built recursively: the l-block of (l-1) ⊗ 1 is the
     Casimir eigenspace with eigenvalue l(l+1); its orthonormal basis B
     DEFINES both cg(l-1, 1, l) := B and K_l := Bᵀ(K_{l-1}⊕K_1)B.
  3. general CG(l1, l2, l3): unique (up to sign) unit-norm solution of the
     intertwining constraint Q·(K_{l1}⊕K_{l2}) = K_{l3}·Q via SVD nullspace
     — exactly the equation the reference's `basis_transformation_Q_J`
     solves, done once on the host with no disk cache.
  4. Wigner-D from the matrix exponential of the generators (axis-angle).

Real spherical harmonics follow the same recursion (`sh.py` runs it in JAX),
so Y_l(R v) = D_l(R) Y_l(v) holds to float64 accuracy by construction.
"""

from __future__ import annotations

from functools import lru_cache
from math import sqrt

import numpy as np
from scipy.linalg import expm

# permutation xyz → (y, z, x) for the l=1 real basis
_P_YZX = np.array(
    [
        [0.0, 1.0, 0.0],
        [0.0, 0.0, 1.0],
        [1.0, 0.0, 0.0],
    ]
)

# so(3) generators in the xyz vector basis: (G_a)_{bc} = -ε_{abc}
_G = np.zeros((3, 3, 3))
for _a, _b, _c, _s in [
    (0, 1, 2, -1.0), (0, 2, 1, 1.0),
    (1, 0, 2, 1.0), (1, 2, 0, -1.0),
    (2, 0, 1, -1.0), (2, 1, 0, 1.0),
]:
    _G[_a, _b, _c] = _s


@lru_cache(maxsize=None)
def so3_generators(l: int) -> np.ndarray:
    """[3, 2l+1, 2l+1] antisymmetric generators (K_x, K_y, K_z) of the real
    l-irrep in this library's basis."""
    if l == 0:
        return np.zeros((3, 1, 1))
    if l == 1:
        return np.einsum("ij,ajk,lk->ail", _P_YZX, _G, _P_YZX)
    B = _casimir_basis(l)  # [ (2l-1)*3, 2l+1 ]
    K = _product_generators(l - 1, 1)
    return np.einsum("pi,apq,qj->aij", B, K, B)


def _product_generators(l1: int, l2: int) -> np.ndarray:
    """Generators of the product rep l1 ⊗ l2, shape [3, d1*d2, d1*d2]."""
    k1, k2 = so3_generators(l1), so3_generators(l2)
    d1, d2 = k1.shape[-1], k2.shape[-1]
    i1, i2 = np.eye(d1), np.eye(d2)
    out = np.einsum("apq,rs->aprqs", k1, i2) + np.einsum("pq,ars->aprqs", i1, k2)
    return out.reshape(3, d1 * d2, d1 * d2)


@lru_cache(maxsize=None)
def _casimir_basis(l: int) -> np.ndarray:
    """Orthonormal basis of the l-block inside (l-1) ⊗ 1 (Casimir projection)."""
    K = _product_generators(l - 1, 1)
    casimir = -sum(K[a] @ K[a] for a in range(3))
    w, v = np.linalg.eigh(casimir)
    target = l * (l + 1)
    sel = np.abs(w - target) < 1e-6
    B = v[:, sel]
    assert B.shape[1] == 2 * l + 1, f"l={l}: found {B.shape[1]} of {2 * l + 1}"
    return B


@lru_cache(maxsize=None)
def real_clebsch_gordan(l1: int, l2: int, l3: int) -> np.ndarray:
    """Real CG tensor Q [2l1+1, 2l2+1, 2l3+1], unit Frobenius norm.

    Intertwining property (the defining equation):
        einsum('abc,ai,bj->ijc', Q, D_l1, D_l2) == einsum('ijk,kc->ijc', Q, D_l3)
    """
    if not (abs(l1 - l2) <= l3 <= l1 + l2):
        return np.zeros((2 * l1 + 1, 2 * l2 + 1, 2 * l3 + 1))
    d1, d2, d3 = 2 * l1 + 1, 2 * l2 + 1, 2 * l3 + 1
    if l2 == 1 and l3 == l1 + 1:
        # the recursion anchor: defined by the Casimir basis directly
        return _casimir_basis(l3).reshape(d1, d2, d3) if l2 == 1 else None
    kp = _product_generators(l1, l2)  # [3, d1*d2, d1*d2]
    k3 = so3_generators(l3)
    # Intertwining constraint as a linear operator on vec(Q):
    # for each generator a: (Kp[a]ᵀ Q - Q K3[a]ᵀ) = 0, Q viewed as [d1*d2, d3]
    mats = []
    for a in range(3):
        t1 = np.einsum("qp,ce->pcqe", kp[a], np.eye(d3))
        t2 = np.einsum("pq,ce->pcqe", np.eye(d1 * d2), k3[a])
        mats.append((t1 - t2).reshape(d1 * d2 * d3, d1 * d2 * d3))
    L = np.concatenate(mats, axis=0)
    _, s, vh = np.linalg.svd(L)
    null = vh[s.size - np.sum(s < 1e-8) :] if np.sum(s < 1e-8) else vh[-1:]
    assert null.shape[0] == 1, (
        f"CG({l1},{l2},{l3}): nullspace dim {null.shape[0]} != 1"
    )
    Q = null[0].reshape(d1, d2, d3)
    Q = Q / np.linalg.norm(Q)
    # deterministic sign: first element with significant magnitude is positive
    flat = Q.reshape(-1)
    first = flat[np.argmax(np.abs(flat) > 1e-6)]
    if first < 0:
        Q = -Q
    return Q


def wigner_d_rotation(l: int, R: np.ndarray) -> np.ndarray:
    """Real Wigner-D D_l(R) via generators (axis-angle + expm)."""
    if l == 0:
        return np.ones((1, 1))
    R = np.asarray(R, dtype=np.float64)
    # axis-angle from R
    cos = (np.trace(R) - 1.0) / 2.0
    cos = np.clip(cos, -1.0, 1.0)
    theta = np.arccos(cos)
    if theta < 1e-12:
        return np.eye(2 * l + 1)
    if abs(theta - np.pi) < 1e-9:
        # R = I + 2K² with axis from the symmetric part
        A = (R + np.eye(3)) / 2.0
        axis = np.sqrt(np.maximum(np.diag(A), 0.0))
        # fix signs using off-diagonals
        i = int(np.argmax(axis))
        axis = A[i] / max(axis[i], 1e-12)
        axis = axis / np.linalg.norm(axis)
    else:
        axis = (
            np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
            / (2.0 * np.sin(theta))
        )
    K = so3_generators(l)
    gen = theta * sum(axis[a] * K[a] for a in range(3))
    return expm(gen)


def spherical_harmonics_np(lmax: int, vec: np.ndarray) -> list[np.ndarray]:
    """Reference (numpy) real SH, component normalization ‖Y_l‖ = √(2l+1).

    Same CG recursion as the runtime JAX version (`equihgnn_tpu/ops/sh.py`);
    equivariant against `wigner_d_rotation` by construction.
    """
    v = np.asarray(vec, dtype=np.float64)
    n = np.linalg.norm(v, axis=-1, keepdims=True)
    u = v / np.maximum(n, 1e-12)
    ys = [np.ones(v.shape[:-1] + (1,))]
    if lmax == 0:
        return ys
    y1 = u[..., [1, 2, 0]] * sqrt(3)
    ys.append(y1)
    consts = sh_norm_constants(lmax)
    for l in range(2, lmax + 1):
        Q = real_clebsch_gordan(l - 1, 1, l)
        y = np.einsum("abc,...a,...b->...c", Q, ys[l - 1], y1)
        ys.append(y * consts[l])
    return ys


@lru_cache(maxsize=None)
def sh_norm_constants(lmax: int) -> tuple:
    """Rescales so the CG recursion yields ‖Y_l(r̂)‖ = √(2l+1).

    The norm of the raw recursion output is direction-independent (it is an
    equivariant map of unit vectors), so one reference direction suffices.
    """
    consts = [1.0, 1.0]
    y_prev = np.array([0.0, sqrt(3), 0.0])  # Y_1(ẑ) in (y,z,x) basis
    y1 = y_prev.copy()
    for l in range(2, lmax + 1):
        Q = real_clebsch_gordan(l - 1, 1, l)
        y = np.einsum("abc,a,b->c", Q, y_prev, y1)
        c = sqrt(2 * l + 1) / np.linalg.norm(y)
        consts.append(float(c))
        y_prev = y * c
    return tuple(consts)
