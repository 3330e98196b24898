"""Shared model helpers: activations, pooling, readouts."""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from equihgnn_tpu.nn.mlp import PReLU
from equihgnn_tpu.ops.segment import masked_segment_reduce, segment_sum


def make_activation(name: str, parent_scope: nn.Module | None = None):
    """{Id, relu, prelu} (`reference equihgnn/models/mhnn.py:23-24`)."""
    if name == "Id":
        return lambda x: x
    if name == "relu":
        return nn.relu
    if name == "prelu":
        # caller must construct PReLU() inside its own compact scope
        raise ValueError("construct PReLU() in the model scope for 'prelu'")
    raise ValueError(f"Unknown activation {name!r}")


class Activation(nn.Module):
    """Module wrapper so 'prelu' gets a (shared) learnable parameter."""

    kind: str = "relu"

    @nn.compact
    def __call__(self, x):
        if self.kind == "Id":
            return x
        if self.kind == "relu":
            return nn.relu(x)
        if self.kind == "prelu":
            return PReLU()(x)
        raise ValueError(f"Unknown activation {self.kind!r}")


def global_add_pool(x, graph_id, num_graphs: int, mask=None):
    """Masked per-graph sum (`torch_geometric.nn.global_add_pool` equivalent)."""
    return segment_sum(x, graph_id, num_graphs, mask=mask)


def global_pool(x, graph_id, num_graphs: int, mask=None, reduce: str = "sum"):
    return masked_segment_reduce(x, graph_id, num_graphs, reduce, mask=mask)


def conjugated_hedge_pool(e, batch):
    """Pool conjugated-group hyperedge embeddings per graph.

    Reference: `global_add_pool(e[data.e_order > 2], he_batch)`
    (`reference equihgnn/models/mhnn.py:79`). Graphs without a conjugated
    hyperedge contribute zeros (the reference would shape-mismatch there; our
    masked form is total).
    """
    conj = (batch.e_order > 2) & batch.hedge_mask
    return segment_sum(
        e, batch.hedge_graph_id, batch.num_graphs, mask=conj
    )


def flat_pred(x):
    """`.view(-1)` of a [G, 1] head output; predictions always float32."""
    return jnp.reshape(x, (-1,)).astype(jnp.float32)


def cast_compute(cfg, *arrays):
    """Cast activations to the configured compute dtype (no-op by default)."""
    if cfg.compute_dtype is None:
        return arrays if len(arrays) > 1 else arrays[0]
    dt = jnp.dtype(cfg.compute_dtype)
    out = tuple(None if a is None else a.astype(dt) for a in arrays)
    return out if len(out) > 1 else out[0]
