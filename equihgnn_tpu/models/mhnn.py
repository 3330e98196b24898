"""Molecular Hypergraph Neural Network family: MHNN / MHNNS / MHNNM.

TPU re-design of `reference equihgnn/models/mhnn.py:11-218`. The per-forward
Python `e_batch` loop (`mhnn.py:59-62`) is gone — the batcher precomputes
`hedge_graph_id`. Forward = AtomEncoder → shared trunk (see
`equihgnn_tpu/models/trunks.py`). Registered names match the reference.
"""

from __future__ import annotations

from flax import linen as nn

from equihgnn_tpu.common.registry import registry
from equihgnn_tpu.data.structures import HyperGraphBatch
from equihgnn_tpu.models.config import ModelConfig
from equihgnn_tpu.models.trunks import TrunkFull, TrunkM, TrunkS
from equihgnn_tpu.nn.encoders import AtomEncoder


class _MHNNBase(nn.Module):
    num_target: int
    cfg: ModelConfig

    def encode(self, batch: HyperGraphBatch):
        from equihgnn_tpu.models.common import cast_compute

        x = AtomEncoder(self.cfg.mlp_hidden, name="atom_encoder")(batch.atom_feat)
        return cast_compute(self.cfg, x)


@registry.register_model("mhnn")
class MHNN(_MHNNBase):
    """Shared-parameter bipartite MHNN with conjugated-hyperedge readout
    (`reference mhnn.py:11-81`)."""

    @nn.compact
    def __call__(self, batch: HyperGraphBatch, deterministic: bool = True):
        x = self.encode(batch)
        return TrunkFull(self.num_target, self.cfg, name="trunk")(
            x, batch, deterministic
        )


@registry.register_model("mhnns")
class MHNNS(_MHNNBase):
    """Simple/fast shared-parameter variant (`reference mhnn.py:84-141`)."""

    @nn.compact
    def __call__(self, batch: HyperGraphBatch, deterministic: bool = True):
        x = self.encode(batch)
        return TrunkS(self.num_target, self.cfg, name="trunk")(
            x, batch, deterministic
        )


@registry.register_model("mhnnm")
class MHNNM(_MHNNBase):
    """Per-layer parameters + BatchNorm variant (`reference mhnn.py:144-218`)."""

    @nn.compact
    def __call__(self, batch: HyperGraphBatch, deterministic: bool = True):
        x = self.encode(batch)
        return TrunkM(self.num_target, self.cfg, name="trunk")(
            x, batch, deterministic
        )
