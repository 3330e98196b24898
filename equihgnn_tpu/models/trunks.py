"""Shared hypergraph trunks used by every *EquiHNN{,S,M} hybrid model.

The reference duplicates the MHNN / MHNNS / MHNNM forward body in each of the
five encoder families (`equihnn_egnn.py`, `equihnn_equiformer.py`,
`equihnn_se3_transformer.py`, `equihnn_visnet.py`, `equihnn_fa_former.py`);
here the trunk is factored once and each hybrid composes
(geometric encoder → trunk).

  * `TrunkFull`  = shared MHNNConv + conjugated-hyperedge readout
                   (`reference equihnn_egnn.py:69-96`)
  * `TrunkS`     = shared MHNNSConv, node pool
                   (`reference equihnn_egnn.py:154-168`)
  * `TrunkM`     = per-layer MHNNConv + BatchNorm, node pool
                   (`reference equihnn_egnn.py:236-261`)
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from equihgnn_tpu.data.structures import HyperGraphBatch, incidence_slots
from equihgnn_tpu.models.common import (
    Activation,
    cast_compute,
    conjugated_hedge_pool,
    flat_pred,
    global_add_pool,
)
from equihgnn_tpu.models.config import ModelConfig
from equihgnn_tpu.nn.encoders import HedgeEncoder
from equihgnn_tpu.nn.hgconv import MHNNConv, MHNNSConv
from equihgnn_tpu.nn.mlp import MLP, MaskedBatchNorm


class TrunkFull(nn.Module):
    """Shared MHNNConv trunk with conjugated readout (MHNN-style)."""

    num_target: int
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, batch: HyperGraphBatch, deterministic: bool = True):
        cfg = self.cfg
        act = Activation(cfg.activation, name="act")
        drop = nn.Dropout(cfg.dropout)
        e = cast_compute(cfg, HedgeEncoder(cfg.mlp_hidden, name="bond_encoder")(batch.hedge_feat))
        conv = MHNNConv(
            hid_dim=cfg.mlp_hidden,
            mlp1_layers=cfg.mlp1_layers,
            mlp2_layers=cfg.mlp2_layers,
            mlp3_layers=cfg.mlp3_layers,
            mlp4_layers=cfg.mlp4_layers,
            aggr=cfg.aggregate,
            dropout=cfg.dropout,
            normalization=cfg.normalization,
            axis_name=cfg.axis_name,
            name="conv",
        )
        slots = incidence_slots(batch)
        for i in range(cfg.all_num_layers):
            x, e = conv(
                x,
                e,
                batch.vertex_idx,
                batch.hedge_idx,
                batch.inc_mask,
                atom_mask=batch.atom_mask,
                hedge_mask=batch.hedge_mask,
                deterministic=deterministic,
                slots=slots,
            )
            if i == cfg.all_num_layers - 1:
                x = drop(x, deterministic=deterministic)
                e = drop(e, deterministic=deterministic)
            else:
                x = drop(act(x), deterministic=deterministic)
                e = drop(act(e), deterministic=deterministic)
        xg = global_add_pool(
            x, batch.atom_graph_id, batch.num_graphs, mask=batch.atom_mask
        )
        eg = conjugated_hedge_pool(e, batch)
        out = MLP(
            hidden_channels=cfg.output_hidden * 2,
            out_channels=self.num_target,
            num_layers=cfg.output_num_layers,
            dropout=cfg.dropout,
            normalization=cfg.normalization,
            axis_name=cfg.axis_name,
            name="mlp_out",
        )(
            jnp.concatenate([xg, eg], -1),
            mask=batch.graph_mask,
            deterministic=deterministic,
        )
        return flat_pred(out)


class TrunkS(nn.Module):
    """Shared MHNNSConv trunk (MHNNS-style)."""

    num_target: int
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, batch: HyperGraphBatch, deterministic: bool = True):
        cfg = self.cfg
        act = Activation(cfg.activation, name="act")
        drop = nn.Dropout(cfg.dropout)
        x0 = x
        conv = MHNNSConv(
            hid_dim=cfg.mlp_hidden,
            mlp1_layers=cfg.mlp1_layers,
            mlp2_layers=cfg.mlp2_layers,
            mlp3_layers=cfg.mlp3_layers,
            aggr=cfg.aggregate,
            dropout=cfg.dropout,
            normalization=cfg.normalization,
            axis_name=cfg.axis_name,
            name="conv",
        )
        slots = incidence_slots(batch)
        for _ in range(cfg.all_num_layers):
            x = drop(x, deterministic=deterministic)
            x = conv(
                x,
                batch.vertex_idx,
                batch.hedge_idx,
                batch.inc_mask,
                x0,
                batch.num_hedges,
                atom_mask=batch.atom_mask,
                deterministic=deterministic,
                slots=slots,
            )
            x = act(x)
        x = drop(x, deterministic=deterministic)
        xg = global_add_pool(
            x, batch.atom_graph_id, batch.num_graphs, mask=batch.atom_mask
        )
        out = MLP(
            hidden_channels=cfg.output_hidden,
            out_channels=self.num_target,
            num_layers=cfg.output_num_layers,
            dropout=cfg.dropout,
            normalization=cfg.normalization,
            axis_name=cfg.axis_name,
            name="mlp_out",
        )(xg, mask=batch.graph_mask, deterministic=deterministic)
        return flat_pred(out)


class TrunkM(nn.Module):
    """Per-layer MHNNConv + BatchNorm trunk (MHNNM-style)."""

    num_target: int
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, batch: HyperGraphBatch, deterministic: bool = True):
        cfg = self.cfg
        act = Activation(cfg.activation, name="act")
        drop = nn.Dropout(cfg.dropout)
        e = cast_compute(cfg, HedgeEncoder(cfg.mlp_hidden, name="bond_encoder")(batch.hedge_feat))
        slots = incidence_slots(batch)
        for i in range(cfg.all_num_layers):
            layer = MHNNConv(
                hid_dim=cfg.mlp_hidden,
                mlp1_layers=cfg.mlp1_layers,
                mlp2_layers=cfg.mlp2_layers,
                mlp3_layers=cfg.mlp3_layers,
                mlp4_layers=cfg.mlp4_layers,
                aggr=cfg.aggregate,
                dropout=cfg.dropout,
                normalization=cfg.normalization,
                axis_name=cfg.axis_name,
                name=f"layers_{i}",
            )
            x, e = layer(
                x,
                e,
                batch.vertex_idx,
                batch.hedge_idx,
                batch.inc_mask,
                atom_mask=batch.atom_mask,
                hedge_mask=batch.hedge_mask,
                deterministic=deterministic,
                slots=slots,
            )
            x = MaskedBatchNorm(axis_name=cfg.axis_name, name=f"batch_norms_{i}")(
                x, mask=batch.atom_mask, use_running_average=deterministic
            )
            if i == cfg.all_num_layers - 1:
                x = drop(x, deterministic=deterministic)
                e = drop(e, deterministic=deterministic)
            else:
                x = drop(act(x), deterministic=deterministic)
                e = drop(act(e), deterministic=deterministic)
        xg = global_add_pool(
            x, batch.atom_graph_id, batch.num_graphs, mask=batch.atom_mask
        )
        out = MLP(
            hidden_channels=cfg.output_hidden,
            out_channels=self.num_target,
            num_layers=cfg.output_num_layers,
            dropout=cfg.dropout,
            normalization=cfg.normalization,
            axis_name=cfg.axis_name,
            name="mlp_out",
        )(xg, mask=batch.graph_mask, deterministic=deterministic)
        return flat_pred(out)
