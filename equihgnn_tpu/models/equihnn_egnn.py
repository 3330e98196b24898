"""EGNN-encoded hypergraph models: egnn_equihnn / egnn_equihnns / egnn_equihnnm.

Re-design of `reference equihgnn/models/equihnn_egnn.py:12-261`: one EGNN layer
(norm_coors, norm_feats, valid_radius=5.0, k=16) encodes 3-D structure into the
atom embeddings, then the MHNN / MHNNS / MHNNM hypergraph trunk runs.
"""

from __future__ import annotations

from flax import linen as nn

from equihgnn_tpu.common.registry import registry
from equihgnn_tpu.data.structures import HyperGraphBatch
from equihgnn_tpu.models.config import ModelConfig
from equihgnn_tpu.models.trunks import TrunkFull, TrunkM, TrunkS
from equihgnn_tpu.nn.egnn import EGNN
from equihgnn_tpu.nn.encoders import AtomEncoder


class _EGNNBase(nn.Module):
    num_target: int
    cfg: ModelConfig

    def encode(self, batch: HyperGraphBatch, deterministic: bool):
        cfg = self.cfg
        if batch.pos is None:
            raise ValueError(
                "egnn_equihnn* models need 3-D coordinates: build batches with "
                "with_pos=True (use a *_hg_3d dataset)"
            )
        from equihgnn_tpu.models.common import cast_compute

        x = AtomEncoder(cfg.mlp_hidden, name="atom_encoder")(batch.atom_feat)
        x, pos = cast_compute(cfg, x, batch.pos)
        # remat replaces the reference's reversible-sequence memory trick
        # (SURVEY §5.7): recompute the encoder in backward instead of storing
        # its activations
        egnn_cls = nn.remat(EGNN) if cfg.remat else EGNN
        x, _ = egnn_cls(
            dim=cfg.mlp_hidden,
            norm_coors=True,
            norm_feats=True,
            valid_radius=5.0,
            num_nearest_neighbors=16,
            dropout=0.0,
            cross_molecule=cfg.cross_molecule_knn,
            name="egnn_layer",
        )(
            x,
            pos,
            mask=batch.atom_mask,
            graph_id=batch.atom_graph_id,
            slot_index=batch.slot_index,
            slot_mask=batch.slot_mask,
            atom_slot=batch.atom_slot,
            slot_gid=batch.slot_gid,
            atom_row=batch.atom_row,
            deterministic=deterministic,
        )
        return x


@registry.register_model("egnn_equihnn")
class EGNNEquiHNN(_EGNNBase):
    @nn.compact
    def __call__(self, batch: HyperGraphBatch, deterministic: bool = True):
        x = self.encode(batch, deterministic)
        return TrunkFull(self.num_target, self.cfg, name="trunk")(
            x, batch, deterministic
        )


@registry.register_model("egnn_equihnns")
class EGNNEquiHNNS(_EGNNBase):
    @nn.compact
    def __call__(self, batch: HyperGraphBatch, deterministic: bool = True):
        x = self.encode(batch, deterministic)
        return TrunkS(self.num_target, self.cfg, name="trunk")(
            x, batch, deterministic
        )


@registry.register_model("egnn_equihnnm")
class EGNNEquiHNNM(_EGNNBase):
    @nn.compact
    def __call__(self, batch: HyperGraphBatch, deterministic: bool = True):
        x = self.encode(batch, deterministic)
        return TrunkM(self.num_target, self.cfg, name="trunk")(
            x, batch, deterministic
        )
