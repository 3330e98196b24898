"""Segment reductions over static-shape padded index arrays.

These are the TPU-native replacement for the reference's `torch_scatter.scatter`
calls (the hypergraph message-passing hot op, `reference
equihgnn/models/layers/conv.py:91-97,173-177`). All shapes are static; padding
is expressed with a mask and padded entries contribute zero. XLA lowers
`jax.ops.segment_sum` to a sorted-scatter that fuses with the surrounding
elementwise ops; for the MXU-bound sorted formulation see
`equihgnn_tpu/ops/pallas/segment_sum.py`.

Semantics parity notes:
  * `reduce="mean"` divides by the member count and returns 0 for empty
    segments (matches torch-scatter).
  * `reduce="max"` returns 0 (not -inf) for empty segments (matches
    torch-scatter's zero-fill for out-of-range defaults used here).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(data, segment_ids, num_segments: int, mask=None):
    """Masked segment sum. `data` [M, ...], `segment_ids` [M] → [num_segments, ...]."""
    if mask is not None:
        data = data * mask.astype(data.dtype).reshape(mask.shape + (1,) * (data.ndim - 1))
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_count(segment_ids, num_segments: int, mask=None, dtype=jnp.float32):
    ones = jnp.ones(segment_ids.shape, dtype=dtype)
    if mask is not None:
        ones = ones * mask.astype(dtype)
    return jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)


def segment_mean(data, segment_ids, num_segments: int, mask=None):
    """Masked segment mean; empty segments map to 0."""
    total = segment_sum(data, segment_ids, num_segments, mask=mask)
    count = segment_count(segment_ids, num_segments, mask=mask, dtype=total.dtype)
    count = count.reshape(count.shape + (1,) * (total.ndim - 1))
    return total / jnp.maximum(count, 1.0)


def segment_max(data, segment_ids, num_segments: int, mask=None):
    """Masked segment max; empty segments map to 0 (torch-scatter zero fill)."""
    neg = jnp.finfo(data.dtype).min
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (data.ndim - 1))
        data = jnp.where(m, data, neg)
    out = jax.ops.segment_max(data, segment_ids, num_segments=num_segments)
    return jnp.where(out <= neg / 2, 0.0, out).astype(data.dtype)


def segment_softmax(logits, segment_ids, num_segments: int, mask=None):
    """Numerically-stable softmax within each segment (for attention pooling)."""
    neg = jnp.finfo(logits.dtype).min
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (logits.ndim - 1))
        logits = jnp.where(m, logits, neg)
    seg_max = jax.ops.segment_max(logits, segment_ids, num_segments=num_segments)
    seg_max = jnp.where(seg_max <= neg / 2, 0.0, seg_max)
    logits = logits - seg_max[segment_ids]
    ex = jnp.exp(logits)
    if mask is not None:
        ex = ex * mask.reshape(mask.shape + (1,) * (ex.ndim - 1)).astype(ex.dtype)
    denom = jax.ops.segment_sum(ex, segment_ids, num_segments=num_segments)
    return ex / jnp.maximum(denom[segment_ids], 1e-16)


def _use_pallas() -> bool:
    import os

    if os.environ.get("EQUIHGNN_TPU_NO_PALLAS"):
        return False
    return jax.default_backend() == "tpu"


def masked_segment_reduce(
    data, segment_ids, num_segments: int, reduce: str, mask=None,
    sorted_ids: bool = False,
):
    """Dispatch on the reference's `aggr` strings {"sum", "mean", "add", "max"}.

    `sorted_ids=True` (the hyperedge direction of the incidence arrays, sorted
    by construction) routes sum/mean through the Pallas sorted-segment kernel
    on TPU (~1.3× over the XLA scatter; exact under HIGHEST precision).
    """
    if sorted_ids and reduce in ("sum", "add", "mean") and _use_pallas():
        from equihgnn_tpu.ops.pallas.segment_sum import sorted_segment_sum

        d = data
        if mask is not None:
            d = d * mask.astype(d.dtype).reshape(mask.shape + (1,) * (d.ndim - 1))
        total = sorted_segment_sum(d, segment_ids, num_segments)
        if reduce in ("sum", "add"):
            return total
        count = segment_count(segment_ids, num_segments, mask=mask, dtype=total.dtype)
        return total / jnp.maximum(count[..., None], 1.0)
    if reduce in ("sum", "add"):
        return segment_sum(data, segment_ids, num_segments, mask=mask)
    if reduce == "mean":
        return segment_mean(data, segment_ids, num_segments, mask=mask)
    if reduce == "max":
        return segment_max(data, segment_ids, num_segments, mask=mask)
    raise ValueError(f"Unknown reduce: {reduce!r}")
