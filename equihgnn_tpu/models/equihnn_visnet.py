"""ViSNet-encoded hypergraph models: visnet_equihnn / visnet_equihnns / visnet_equihnnm.

Re-design of `reference equihgnn/models/equihnn_visnet.py:11-243`: a ViSNet
block (`hidden_channels=MLP_hidden, lmax=2, max_num_neighbors=16`) encodes
3-D structure into per-atom scalars (it embeds the OGB atom features
internally — no separate AtomEncoder), then the MHNN/MHNNS/MHNNM trunk runs.
"""

from __future__ import annotations

from flax import linen as nn

from equihgnn_tpu.common.registry import registry
from equihgnn_tpu.data.structures import HyperGraphBatch
from equihgnn_tpu.models.config import ModelConfig
from equihgnn_tpu.models.trunks import TrunkFull, TrunkM, TrunkS
from equihgnn_tpu.nn.visnet import ViSNet


class _ViSNetBase(nn.Module):
    num_target: int
    cfg: ModelConfig

    def encode(self, batch: HyperGraphBatch, deterministic: bool):
        cfg = self.cfg
        if batch.pos is None or batch.slot_index is None:
            raise ValueError(
                "visnet_equihnn* models need 3-D coordinates and the dense "
                "per-molecule view: build batches with with_pos=True"
            )
        visnet_cls = nn.remat(ViSNet) if cfg.remat else ViSNet
        return visnet_cls(
            hidden_channels=cfg.mlp_hidden,
            dtype=cfg.compute_dtype,
            lmax=2,
            max_num_neighbors=16,
            name="visnet_layer",
        )(
            batch.atom_feat,
            batch.pos,
            batch.atom_graph_id if batch.atom_row is None else batch.atom_row,
            batch.slot_index,
            batch.slot_mask,
            batch.atom_slot,
            slot_gid=batch.slot_gid,
        )


@registry.register_model("visnet_equihnn")
class VisNetEquiHNN(_ViSNetBase):
    @nn.compact
    def __call__(self, batch: HyperGraphBatch, deterministic: bool = True):
        x = self.encode(batch, deterministic)
        return TrunkFull(self.num_target, self.cfg, name="trunk")(
            x, batch, deterministic
        )


@registry.register_model("visnet_equihnns")
class VisNetEquiHNNS(_ViSNetBase):
    @nn.compact
    def __call__(self, batch: HyperGraphBatch, deterministic: bool = True):
        x = self.encode(batch, deterministic)
        return TrunkS(self.num_target, self.cfg, name="trunk")(
            x, batch, deterministic
        )


@registry.register_model("visnet_equihnnm")
class VisNetEquiHNNM(_ViSNetBase):
    @nn.compact
    def __call__(self, batch: HyperGraphBatch, deterministic: bool = True):
        x = self.encode(batch, deterministic)
        return TrunkM(self.num_target, self.cfg, name="trunk")(
            x, batch, deterministic
        )
