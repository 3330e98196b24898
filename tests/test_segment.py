import jax.numpy as jnp
import numpy as np

import pytest

from equihgnn_tpu.ops.segment import (
    masked_segment_reduce,
    segment_max,
    segment_mean,
    segment_softmax,
    segment_sum,
)

pytestmark = pytest.mark.quick


def _numpy_scatter(data, ids, num_segments, reduce, mask=None):
    """torch-scatter oracle (zero for empty segments)."""
    out = np.zeros((num_segments,) + data.shape[1:], dtype=np.float64)
    cnt = np.zeros((num_segments,), dtype=np.float64)
    for i, s in enumerate(ids):
        if mask is not None and not mask[i]:
            continue
        if reduce == "max":
            out[s] = np.maximum(out[s], data[i]) if cnt[s] > 0 else data[i]
        else:
            out[s] += data[i]
        cnt[s] += 1
    if reduce == "mean":
        out[cnt > 0] /= cnt[cnt > 0, None] if data.ndim > 1 else cnt[cnt > 0]
    return out


def test_segment_sum_mean_max_vs_oracle(rng):
    m, s, d = 57, 9, 5
    data = rng.standard_normal((m, d)).astype(np.float32)
    ids = rng.integers(0, s, size=m)
    mask = rng.random(m) > 0.3
    for reduce in ["sum", "mean", "max"]:
        got = masked_segment_reduce(
            jnp.asarray(data), jnp.asarray(ids), s, reduce, mask=jnp.asarray(mask)
        )
        want = _numpy_scatter(data, ids, s, reduce, mask=mask)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_empty_segments_are_zero(rng):
    data = rng.standard_normal((4, 3)).astype(np.float32)
    ids = np.array([0, 0, 2, 2])
    for fn in (segment_sum, segment_mean, segment_max):
        out = np.asarray(fn(jnp.asarray(data), jnp.asarray(ids), 5))
        assert np.all(out[1] == 0) and np.all(out[3] == 0) and np.all(out[4] == 0)


def test_segment_softmax_normalizes(rng):
    m, s = 40, 6
    logits = rng.standard_normal((m, 2)).astype(np.float32) * 5
    ids = rng.integers(0, s, size=m)
    mask = rng.random(m) > 0.2
    p = np.asarray(
        segment_softmax(jnp.asarray(logits), jnp.asarray(ids), s, mask=jnp.asarray(mask))
    )
    assert np.all(p[~mask] == 0)
    sums = _numpy_scatter(p.astype(np.float64), ids, s, "sum", mask=mask)
    occupied = _numpy_scatter(np.ones((m, 1)), ids, s, "sum", mask=mask) > 0
    np.testing.assert_allclose(sums[occupied[:, 0]], 1.0, rtol=1e-5)
