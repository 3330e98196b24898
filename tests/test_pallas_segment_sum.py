"""Pallas sorted-segment-sum kernel: contract check + fallback correctness.

Runs the kernel in interpret mode on the CPU test platform (the wrapper
switches to `interpret=True` off-TPU), so the block-window contract and the
runtime fallback are exercised in CI, not just on hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np

from equihgnn_tpu.ops.pallas.segment_sum import (
    BM,
    _contract_ok,
    sorted_segment_sum,
)


def _oracle(data, ids, num_segments):
    out = np.zeros((num_segments, data.shape[1]), np.float64)
    for i, s in enumerate(ids):
        out[s] += data[i]
    return out


def test_sorted_ids_use_kernel_and_match_oracle(rng):
    m, s, d = 700, 300, 17
    ids = np.sort(rng.integers(0, s, size=m))
    data = rng.standard_normal((m, d)).astype(np.float32)
    assert bool(_contract_ok(jnp.asarray(ids)))
    got = sorted_segment_sum(jnp.asarray(data), jnp.asarray(ids), s)
    np.testing.assert_allclose(np.asarray(got), _oracle(data, ids, s), rtol=1e-5, atol=1e-5)


def test_adversarial_unsorted_ids_fall_back_exactly(rng):
    """Ids that violate the block-window contract (descents + span > BM).

    Before the runtime fallback these rows were silently dropped; now the
    call must route to the XLA scatter and stay exact.
    """
    m, d = 600, 8
    s = 4 * BM
    ids = rng.integers(0, s, size=m)  # unsorted, span ≫ BM
    # force a descent right at a block boundary
    ids[BM - 1], ids[BM] = s - 1, 0
    data = rng.standard_normal((m, d)).astype(np.float32)
    assert not bool(_contract_ok(jnp.asarray(ids)))
    got = sorted_segment_sum(jnp.asarray(data), jnp.asarray(ids), s)
    np.testing.assert_allclose(np.asarray(got), _oracle(data, ids, s), rtol=1e-5, atol=1e-5)


def test_unsorted_within_window_still_uses_kernel(rng):
    """The kernel contract is per-block windows, not global sortedness."""
    m, s, d = 2 * BM, BM, 5
    ids = np.concatenate(
        [
            np.sort(rng.integers(0, BM // 2, size=BM))[::-1].copy(),  # descending, in window
            np.sort(rng.integers(0, BM, size=BM)),
        ]
    )
    ids[0] = 0  # base must be the window floor for a descending block
    ids[BM] = 0
    data = rng.standard_normal((m, d)).astype(np.float32)
    assert bool(_contract_ok(jnp.asarray(ids)))
    got = sorted_segment_sum(jnp.asarray(data), jnp.asarray(ids), s)
    np.testing.assert_allclose(np.asarray(got), _oracle(data, ids, s), rtol=1e-5, atol=1e-5)


def test_gradient_is_gather_on_both_paths(rng):
    m, s, d = 300, 128, 4
    data = rng.standard_normal((m, d)).astype(np.float32)
    for ids in (np.sort(rng.integers(0, s, size=m)), rng.integers(0, s, size=m)):
        ids_j = jnp.asarray(ids)

        def loss(x):
            out = sorted_segment_sum(x, ids_j, s)
            return jnp.sum(out**2)

        g = jax.grad(loss)(jnp.asarray(data))
        want = 2.0 * _oracle(data, ids, s)[ids]
        np.testing.assert_allclose(np.asarray(g), want, rtol=1e-4, atol=1e-4)


def test_oversized_output_uses_xla_path(rng):
    """Outputs too big for the 16 MB scoped VMEM must route to XLA (the
    kernel keeps the whole [segments, lanes] slab resident; a 500k-molecule
    bucket spec crashed compile before this guard)."""
    m, s, d = 4096, 30_000, 256  # sp*dp*4 ≈ 31 MB > budget
    ids = np.sort(rng.integers(0, s, size=m))
    data = rng.standard_normal((m, d)).astype(np.float32)
    got = sorted_segment_sum(jnp.asarray(data), jnp.asarray(ids), s)
    want = jax.ops.segment_sum(jnp.asarray(data), jnp.asarray(ids), num_segments=s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)
