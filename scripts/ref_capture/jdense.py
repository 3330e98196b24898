"""First-party J matrices for the reference's Wigner-D computation.

Both reference encoder subpackages compute real Wigner-D matrices as

    D_l(alpha, beta, gamma) = Z_l(alpha) @ J_l @ Z_l(beta) @ J_l @ Z_l(gamma)

(`reference equihgnn/models/layers/se3_transformer/irr_repr.py:29-37`,
`equiformer/irr_repr.py:23-40`) where ``Z_l`` is their ``z_rot_mat`` and
``J_l`` comes from a ``J_dense.pt`` data blob that is NOT in the reference
checkout. Rather than shipping a binary blob, this module derives each
``J_l`` from first principles, pinned to the reference's OWN conventions:

  1. The real rep ``M_R`` of a rotation ``R`` is defined by the reference's
     tesseral spherical harmonics (`spherical_harmonics.py:83-134`):
     ``Y_l(R x) = M_R Y_l(x)`` — solved by least squares over sampled unit
     vectors (the sign/direction of the convention is detected by comparing
     the solved pure-z rep against ``z_rot_mat``).
  2. ``J_l`` is the rep of the involutive rotation that swaps the y and z
     axes (pi rotation about (0,1,1)/sqrt(2)): conjugation by it turns the
     z-rotation rep into the y-rotation rep, and since the rotation is an
     involution, ``J @ J = I`` — exactly the two properties the Wigner
     product formula needs. Solved directly as the sampled rep of that
     rotation.
  3. The result is verified end-to-end: for random Euler angles,
     ``Z(a) J Z(b) J Z(c) @ Y(x) == Y(rot(a,b,c) x)``.

`install()` monkeypatches ``torch.load`` so that importing the reference's
``irr_repr`` modules transparently receives these matrices; no file is ever
written into /root/reference.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(__file__))

MAX_DEGREE = 4
_CACHE_PATH = os.path.join(os.path.dirname(__file__), "J_dense_firstparty.pt")


def _sh_module():
    import shims

    shims.install()
    from equihgnn.models.layers.se3_transformer import spherical_harmonics as sh

    return sh


def _sh_vec(sh, l: int, xyz: torch.Tensor) -> torch.Tensor:
    """Reference tesseral Y_l on unit vectors: theta = polar angle from +z,
    phi = azimuth (`se3_transformer/basis.py:79-85` angle convention)."""
    xyz = xyz / xyz.norm(dim=-1, keepdim=True)
    theta = torch.acos(xyz[..., 2].clamp(-1.0, 1.0))
    phi = torch.atan2(xyz[..., 1], xyz[..., 0])
    sh.clear_spherical_harmonics_cache()
    return sh.get_spherical_harmonics(l, theta, phi)


def _rep_of_rotation(sh, l: int, R: torch.Tensor, n: int = 64) -> torch.Tensor:
    """Least-squares M with Y_l(R x) = M Y_l(x) over sampled unit vectors."""
    g = torch.Generator().manual_seed(l * 1000 + 7)
    x = torch.randn(n, 3, generator=g, dtype=torch.float64)
    x = x / x.norm(dim=-1, keepdim=True)
    Y = _sh_vec(sh, l, x)  # [n, 2l+1]
    Yr = _sh_vec(sh, l, x @ R.T)  # rows are Y(R x_i)
    # M Y^T = Yr^T  ->  Y M^T = Yr
    M_t, *_ = torch.linalg.lstsq(Y, Yr)
    return M_t.T


def _z_rot_mat(angle: float, l: int) -> torch.Tensor:
    """The reference's z_rot_mat (`se3_transformer/irr_repr.py:40-51`),
    re-stated here to avoid importing irr_repr before J exists."""
    order = 2 * l + 1
    a = torch.tensor(angle, dtype=torch.float64)
    m = torch.zeros(order, order, dtype=torch.float64)
    inds = torch.arange(order)
    reversed_inds = torch.arange(2 * l, -1, -1)
    freq = torch.arange(l, -l - 1, -1, dtype=torch.float64)
    m[inds, reversed_inds] = torch.sin(freq * a)
    m[inds, inds] = torch.cos(freq * a)
    return m


def _rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return torch.tensor(
        [[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]], dtype=torch.float64
    )


def _rot_y(b):
    c, s = np.cos(b), np.sin(b)
    return torch.tensor(
        [[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]], dtype=torch.float64
    )


def _solve_J(sh, l: int) -> torch.Tensor:
    d = 2 * l + 1
    if l == 0:
        return torch.ones(1, 1, dtype=torch.float64)

    # Detect the direction convention: the Wigner formula needs the rep with
    # D(alpha,0,0) == z_rot_mat(alpha); the sampled rep may come out as its
    # inverse (angle sign) depending on active/passive convention.
    a0 = 0.813
    Mz = _rep_of_rotation(sh, l, _rot_z(a0))
    if torch.allclose(Mz, _z_rot_mat(a0, l), atol=1e-8):
        sign = 1.0
    elif torch.allclose(Mz, _z_rot_mat(-a0, l), atol=1e-8):
        sign = -1.0
    else:
        raise AssertionError(
            f"l={l}: sampled z-rotation rep matches neither z_rot_mat(a) "
            f"nor z_rot_mat(-a); convention drift"
        )

    # J = rep of the y<->z axis swap: R = 2uu^T - I, u = (0,1,1)/sqrt(2).
    # An involutive rotation, so direction convention cannot matter
    # (R == R^-1) and J @ J = I by construction.
    u = torch.tensor([0.0, 1.0, 1.0], dtype=torch.float64)
    u = u / u.norm()
    R_swap = 2.0 * torch.outer(u, u) - torch.eye(3, dtype=torch.float64)
    J = _rep_of_rotation(sh, l, R_swap)
    assert torch.allclose(
        J @ J, torch.eye(d, dtype=torch.float64), atol=1e-9
    ), f"l={l}: J@J != I"
    # conjugation check: J Z(b) J must be the y-rotation rep
    for b in (0.91,):
        My = _rep_of_rotation(sh, l, _rot_y(b))
        assert torch.allclose(J @ _z_rot_mat(sign * b, l) @ J, My, atol=1e-8), (
            f"l={l}: J Z J != M_y"
        )

    # end-to-end check: Z(a) J Z(b) J Z(c) Y(x) == Y(rot(a,b,c) x)
    g = torch.Generator().manual_seed(l)
    for _ in range(3):
        a, b, c = (torch.rand(3, generator=g) * 4.0 - 2.0).tolist()
        D = (
            _z_rot_mat(sign * a, l) @ J @ _z_rot_mat(sign * b, l)
            @ J @ _z_rot_mat(sign * c, l)
        )
        R = _rot_z(a) @ _rot_y(b) @ _rot_z(c)
        x = torch.randn(16, 3, generator=g, dtype=torch.float64)
        lhs = _sh_vec(sh, l, x @ R.T)
        rhs = _sh_vec(sh, l, x) @ D.T
        assert torch.allclose(lhs, rhs, atol=1e-8), f"l={l}: D check failed"
    assert sign == 1.0, (
        "reference z_rot_mat direction flipped vs spherical harmonics; "
        "the Wigner formula would not be self-consistent"
    )
    return J


def compute_jdense(max_degree: int = MAX_DEGREE) -> list:
    sh = _sh_module()
    return [_solve_J(sh, l) for l in range(max_degree + 1)]


def get_jdense() -> list:
    if os.path.exists(_CACHE_PATH):
        return torch.load(_CACHE_PATH, weights_only=True)
    jd = compute_jdense()
    torch.save(jd, _CACHE_PATH)
    return jd


def install():
    """Route the reference's `torch.load(.../J_dense.pt)` to the first-party
    matrices. Call BEFORE importing any reference irr_repr module."""
    jd = get_jdense()
    orig = torch.load

    def patched(path, *a, **k):
        if "J_dense" in str(path):
            return [j.clone() for j in jd]
        return orig(path, *a, **k)

    torch.load = patched


if __name__ == "__main__":
    jd = compute_jdense()
    torch.save(jd, _CACHE_PATH)
    for l, J in enumerate(jd):
        print(f"l={l}: J {tuple(J.shape)}, ||J@J - I|| = "
              f"{(J @ J - torch.eye(2 * l + 1, dtype=J.dtype)).abs().max():.2e}")
