"""Equiformer-encoded hypergraph model: equiformer_equihnns.

Re-design of `reference equihgnn/models/equihnn_equiformer.py:12-93` (the
reference ships only the S variant): AtomEncoder → Equiformer(dim=(h,h),
heads=1, depth=1, dim_head=48, num_degrees=2, valid_radius=5, k=16,
MLP attention, attend_self, linear_out) → type-0 output → MHNNS trunk.
"""

from __future__ import annotations

from flax import linen as nn

from equihgnn_tpu.common.registry import registry
from equihgnn_tpu.data.structures import HyperGraphBatch
from equihgnn_tpu.models.config import ModelConfig
from equihgnn_tpu.models.trunks import TrunkS
from equihgnn_tpu.nn.encoders import AtomEncoder
from equihgnn_tpu.nn.equiformer import Equiformer


@registry.register_model("equiformer_equihnns")
class EquiformerEquiHNNS(nn.Module):
    num_target: int
    cfg: ModelConfig

    @nn.compact
    def __call__(self, batch: HyperGraphBatch, deterministic: bool = True):
        cfg = self.cfg
        if batch.pos is None or batch.slot_index is None:
            raise ValueError(
                "equiformer_equihnns needs 3-D coordinates and the dense "
                "per-molecule view: build batches with with_pos=True"
            )
        h = cfg.mlp_hidden
        x = AtomEncoder(h, name="atom_encoder")(batch.atom_feat)
        eq_cls = nn.remat(Equiformer) if cfg.remat else Equiformer
        x, _type1 = eq_cls(
            dim=(h, h),
            dim_in=(h,),
            heads=1,
            depth=1,
            dim_head=48,
            valid_radius=5.0,
            num_neighbors=16,
            attend_self=True,
            dtype=cfg.compute_dtype,
            name="equiformer_layer",
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
