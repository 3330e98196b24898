"""SE(3)-Transformer-encoded hypergraph model: se3_transformer_equihnns.

Re-design of `reference equihgnn/models/equihnn_se3_transformer.py:12-91` (the
reference ships only the S variant): AtomEncoder → SE3Transformer(dim=hidden,
heads=2, depth=2, dim_head=32, num_degrees=2, valid_radius=5, k=16) → type-0
output → MHNNS trunk.
"""

from __future__ import annotations

from flax import linen as nn

from equihgnn_tpu.common.registry import registry
from equihgnn_tpu.data.structures import HyperGraphBatch
from equihgnn_tpu.models.config import ModelConfig
from equihgnn_tpu.models.trunks import TrunkS
from equihgnn_tpu.nn.encoders import AtomEncoder
from equihgnn_tpu.nn.se3_transformer import SE3Transformer


@registry.register_model("se3_transformer_equihnns")
class SE3TransformerEquiHNNS(nn.Module):
    num_target: int
    cfg: ModelConfig

    @nn.compact
    def __call__(self, batch: HyperGraphBatch, deterministic: bool = True):
        cfg = self.cfg
        if batch.pos is None or batch.slot_index is None:
            raise ValueError(
                "se3_transformer_equihnns needs 3-D coordinates and the dense "
                "per-molecule view: build batches with with_pos=True"
            )
        x = AtomEncoder(cfg.mlp_hidden, name="atom_encoder")(batch.atom_feat)
        se3_cls = nn.remat(SE3Transformer) if cfg.remat else SE3Transformer
        x = se3_cls(
            dim=cfg.mlp_hidden,
            heads=2,
            depth=2,
            dim_head=32,
            num_degrees=2,
            valid_radius=5.0,
            num_neighbors=16,
            dtype=cfg.compute_dtype,
            name="se3_transformer_layer",
        )(
            x,
            batch.pos,
            batch.atom_graph_id if batch.atom_row is None else batch.atom_row,
            batch.slot_index,
            batch.slot_mask,
            batch.atom_slot,
            slot_gid=batch.slot_gid,
        )
        return TrunkS(self.num_target, cfg, name="trunk")(x, batch, deterministic)
