"""OGB-compatible atom / bond embedding encoders.

Reimplements `ogb.graphproppred.mol_encoder.{AtomEncoder,BondEncoder}` (used
throughout the reference, e.g. `reference equihgnn/models/mhnn.py:3,32`) as
flax modules: one embedding table per categorical feature, summed. OGB
initializes tables with xavier_uniform; we match.

The sum-of-embeddings is computed as a single gather + reshape + sum so XLA
emits one fused kernel instead of 9 gathers.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from equihgnn_tpu.ops.gather import embed_gather

from equihgnn_tpu.data.structures import (
    ATOM_FEATURE_DIMS,
    BOND_FEATURE_DIMS,
    NUM_HEDGE_TYPES,
)


class _MultiEmbeddingSum(nn.Module):
    """sum_i Embed_i(x[..., i]) with per-feature vocab sizes."""

    vocab_sizes: tuple
    emb_dim: int

    @nn.compact
    def __call__(self, x):
        # One flat table with per-feature offsets: a single gather on TPU.
        offsets = np.concatenate([[0], np.cumsum(self.vocab_sizes)[:-1]]).astype(
            np.int32
        )
        total = int(np.sum(self.vocab_sizes))
        table = self.param(
            "embedding",
            nn.initializers.xavier_uniform(),
            (total, self.emb_dim),
        )
        idx = x + jnp.asarray(offsets)
        # embed_gather: matmul-transpose VJP, no backward scatter
        return jnp.sum(embed_gather(table, idx), axis=-2)


class AtomEncoder(nn.Module):
    """9 categorical atom features → summed embedding [.., emb_dim]."""

    emb_dim: int

    @nn.compact
    def __call__(self, atom_feat):
        return _MultiEmbeddingSum(ATOM_FEATURE_DIMS, self.emb_dim, name="atom")(
            atom_feat
        )


class BondEncoder(nn.Module):
    """Categorical bond features → summed embedding.

    Handles both the 3-feature mol2graph layout and the 1-feature (bond type
    only) layout of the QM9 graph variants — OGB's BondEncoder likewise loops
    over however many columns it is given.
    """

    emb_dim: int

    @nn.compact
    def __call__(self, bond_feat):
        width = bond_feat.shape[-1]
        return _MultiEmbeddingSum(
            BOND_FEATURE_DIMS[:width], self.emb_dim, name="bond"
        )(bond_feat)


class HedgeEncoder(nn.Module):
    """Hyperedge type embedding: `nn.Embedding(6, hidden)` in the reference
    (`reference equihgnn/models/mhnn.py:33`). Torch Embedding default init is
    N(0, 1); we match."""

    emb_dim: int

    @nn.compact
    def __call__(self, hedge_feat):
        table = self.param(
            "embedding",
            nn.initializers.normal(stddev=1.0),
            (NUM_HEDGE_TYPES, self.emb_dim),
        )
        return table[hedge_feat]
