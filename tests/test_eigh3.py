"""Analytic 3×3 symmetric eigensolver vs numpy.linalg.eigh."""

import numpy as np

from equihgnn_tpu.ops.eigh3 import eigh3x3, eigvalsh3x3
import pytest

pytestmark = pytest.mark.quick


def _random_covs(rng, n, p=16):
    x = rng.standard_normal((n, p, 3)).astype(np.float32)
    return np.einsum("bpi,bpj->bij", x, x)


def test_eigenvalues_match_lapack(rng):
    covs = _random_covs(rng, 500)
    lam = np.asarray(eigvalsh3x3(covs))
    want = np.linalg.eigvalsh(covs.astype(np.float64))
    scale = np.abs(want).max(-1, keepdims=True) + 1e-6
    np.testing.assert_allclose(lam / scale, want / scale, atol=2e-5)


def test_eigenvectors_orthonormal_and_valid(rng):
    covs = _random_covs(rng, 500)
    lam, vec = (np.asarray(t) for t in eigh3x3(covs))
    # columns orthonormal
    gram = np.einsum("bij,bik->bjk", vec, vec)
    np.testing.assert_allclose(gram, np.broadcast_to(np.eye(3), gram.shape),
                               atol=2e-4)
    # A v = λ v
    av = np.einsum("bij,bjk->bik", covs, vec)
    lv = lam[:, None, :] * vec
    scale = np.abs(lam).max(-1)[:, None, None] + 1e-6
    np.testing.assert_allclose(av / scale, lv / scale, atol=5e-4)


def test_degenerate_and_isotropic_cases():
    mats = np.stack([
        np.eye(3, dtype=np.float32) * 2.0,            # fully isotropic
        np.diag(np.array([1.0, 1.0, 5.0], np.float32)),  # double eigenvalue
        np.diag(np.array([3.0, 3.0, 3.0], np.float32)),
        np.zeros((3, 3), np.float32),
    ])
    lam, vec = (np.asarray(t) for t in eigh3x3(mats))
    gram = np.einsum("bij,bik->bjk", vec, vec)
    np.testing.assert_allclose(gram, np.broadcast_to(np.eye(3), gram.shape),
                               atol=1e-5)
    av = np.einsum("bij,bjk->bik", mats, vec)
    lv = lam[:, None, :] * vec
    # f32 arccos is ~4e-4 loose exactly AT a double eigenvalue — fine for
    # frame averaging (covariance is stop-gradient; frames only need a
    # deterministic orthonormal basis)
    np.testing.assert_allclose(av, lv, atol=3e-3)
    assert np.all(np.diff(lam, axis=-1) >= -1e-3)  # ascending
