"""FAFormer-encoded hypergraph models: faformer_equihnn{,s,m}.

Re-design of `reference equihgnn/models/equihnn_fa_former.py:12-283`:
AtomEncoder → FAFormer(d_input=d_model=d_edge=MLP_hidden, n_layers=2,
n_heads=2, k=16, valid_radius=5.0, swiglu) → MHNN/MHNNS/MHNNM trunk.
"""

from __future__ import annotations

from flax import linen as nn

from equihgnn_tpu.common.registry import registry
from equihgnn_tpu.data.structures import HyperGraphBatch
from equihgnn_tpu.models.config import ModelConfig
from equihgnn_tpu.models.trunks import TrunkFull, TrunkM, TrunkS
from equihgnn_tpu.nn.encoders import AtomEncoder
from equihgnn_tpu.nn.faformer import FAFormer


class _FAFormerBase(nn.Module):
    num_target: int
    cfg: ModelConfig

    def encode(self, batch: HyperGraphBatch, deterministic: bool):
        cfg = self.cfg
        if batch.pos is None or batch.slot_index is None:
            raise ValueError(
                "faformer_equihnn* models need 3-D coordinates and the dense "
                "per-molecule view: build batches with with_pos=True"
            )
        from equihgnn_tpu.models.common import cast_compute

        x = AtomEncoder(cfg.mlp_hidden, name="atom_encoder")(batch.atom_feat)
        x, pos = cast_compute(cfg, x, batch.pos)
        fa = FAFormer(
            d_input=cfg.mlp_hidden,
            d_model=cfg.mlp_hidden,
            d_edge_model=cfg.mlp_hidden,
            n_layers=2,
            n_heads=2,
            n_neighbors=16,
            valid_radius=5.0,
            activation="swiglu",
            name="fa_former",
        )
        row = (
            batch.atom_graph_id if batch.atom_row is None else batch.atom_row
        )
        args = (
            x, pos, row, batch.slot_index, batch.slot_mask, batch.atom_slot,
        )
        kw = dict(slot_gid=batch.slot_gid, num_graphs=batch.num_graphs)
        if cfg.remat:
            # close over `deterministic` so it stays a static Python bool
            def fwd(mdl, *a):
                return mdl(*a, deterministic=deterministic, **kw)

            x, _ = nn.remat(fwd)(fa, *args)
        else:
            x, _ = fa(*args, deterministic=deterministic, **kw)
        return x


@registry.register_model("faformer_equihnn")
class FAFormerEquiHNN(_FAFormerBase):
    @nn.compact
    def __call__(self, batch: HyperGraphBatch, deterministic: bool = True):
        x = self.encode(batch, deterministic)
        return TrunkFull(self.num_target, self.cfg, name="trunk")(
            x, batch, deterministic
        )


@registry.register_model("faformer_equihnns")
class FAFormerEquiHNNS(_FAFormerBase):
    @nn.compact
    def __call__(self, batch: HyperGraphBatch, deterministic: bool = True):
        x = self.encode(batch, deterministic)
        return TrunkS(self.num_target, self.cfg, name="trunk")(
            x, batch, deterministic
        )


@registry.register_model("faformer_equihnnm")
class FAFormerEquiHNNM(_FAFormerBase):
    @nn.compact
    def __call__(self, batch: HyperGraphBatch, deterministic: bool = True):
        x = self.encode(batch, deterministic)
        return TrunkM(self.num_target, self.cfg, name="trunk")(
            x, batch, deterministic
        )
