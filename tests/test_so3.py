"""SO(3) machinery: Wigner-D, Clebsch-Gordan intertwining, SH equivariance."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import ortho_group

from equihgnn_tpu.ops.sh import spherical_harmonics
from equihgnn_tpu.ops.so3 import (
    real_clebsch_gordan,
    spherical_harmonics_np,
    wigner_d_rotation,
)

pytestmark = pytest.mark.quick


def _rot(seed):
    R = ortho_group.rvs(3, random_state=seed)
    return R * np.sign(np.linalg.det(R))


@pytest.mark.parametrize("l", [0, 1, 2, 3, 4])
def test_wigner_d_is_orthogonal_homomorphism(l):
    R1, R2 = _rot(1), _rot(2)
    D1, D2 = wigner_d_rotation(l, R1), wigner_d_rotation(l, R2)
    np.testing.assert_allclose(D1 @ D1.T, np.eye(2 * l + 1), atol=1e-12)
    np.testing.assert_allclose(
        wigner_d_rotation(l, R1 @ R2), D1 @ D2, atol=1e-12
    )


@pytest.mark.parametrize(
    "lll", [(1, 1, 0), (1, 1, 1), (1, 1, 2), (2, 1, 1), (2, 1, 2), (2, 1, 3),
            (2, 2, 0), (2, 2, 2), (3, 1, 2)]
)
def test_cg_intertwines(lll):
    l1, l2, l3 = lll
    R = _rot(3)
    Q = real_clebsch_gordan(l1, l2, l3)
    D1, D2, D3 = (wigner_d_rotation(l, R) for l in lll)
    lhs = np.einsum("abc,ai,bj->ijc", Q, D1, D2)
    rhs = np.einsum("ijk,ck->ijc", Q, D3)
    np.testing.assert_allclose(lhs, rhs, atol=1e-12)


def test_cg_selection_rule():
    assert np.all(real_clebsch_gordan(1, 1, 3) == 0)


def test_sh_equivariance_and_norm(rng):
    R = _rot(4)
    v = rng.standard_normal((20, 3))
    ys = spherical_harmonics_np(4, v)
    ys_r = spherical_harmonics_np(4, v @ R.T)
    for l in range(5):
        D = wigner_d_rotation(l, R)
        np.testing.assert_allclose(ys_r[l], ys[l] @ D.T, atol=1e-12)
        np.testing.assert_allclose(
            np.linalg.norm(ys[l], axis=-1), np.sqrt(2 * l + 1), atol=1e-10
        )


def test_jax_sh_matches_numpy(rng):
    v = rng.standard_normal((17, 3)).astype(np.float32)
    ys_np = spherical_harmonics_np(3, v)
    ys_jax = spherical_harmonics(3, jnp.asarray(v))
    for l in range(4):
        np.testing.assert_allclose(
            np.asarray(ys_jax[l]), ys_np[l], rtol=1e-5, atol=1e-5
        )


def test_jax_sh_zero_vector_is_zero():
    ys = spherical_harmonics(2, jnp.zeros((3, 3)))
    assert np.all(np.asarray(ys[1]) == 0)
    assert np.all(np.asarray(ys[2]) == 0)
