"""Bipartite hypergraph message-passing convolutions (the computational heart).

TPU-native re-design of `MHNNConv` / `MHNNSConv`
(`reference equihgnn/models/layers/conv.py:8-182`): the torch-scatter calls
become masked `segment_sum`/`segment_mean` over static padded incidence arrays
(`vertex_idx`, `hedge_idx`), with all four MLPs fused by XLA around the
gathers/scatters. Padded incidence entries point at padded atom/hyperedge rows
and are zeroed by `inc_mask` before every reduction, so results are exact.

The `mlp*_layers <= 0` fallback replicates the reference's identity-slice
(`conv.py:33-73`): `W(X) = X[..., hid_dim:]` (second half of the concat).
Note `MHNNSConv`'s reference bug when `mlp3_layers<=0` (assigns `self.W`
instead of `self.W3`, `conv.py:156`, which would crash in forward) — we make
that path a plain identity instead, documented deviation.
"""

from __future__ import annotations

from typing import Optional

from flax import linen as nn

from equihgnn_tpu.nn.mlp import MLP
from equihgnn_tpu.ops import flop_tally
from equihgnn_tpu.ops.segment import masked_segment_reduce


def _slot_onehots(slots, dtype):
    """Masked one-hot matrices for the dense slot-incidence view.

    Returns (Oa [R,Ni,A], Oe [R,Ni,He]): entry→atom-slot and entry→hedge-slot
    assignment matrices. Every gather/scatter of the conv contracts against
    these — batched MXU matmuls in forward AND backward, never an XLA scatter
    (near-serial on TPU; see ops/gather.py and PERF.md).
    """
    import jax.numpy as jnp

    (slot_index, slot_mask, atom_row, atom_slot, hedge_slot_index,
     hedge_slot_mask, hedge_row, hedge_slot, inc_slot_atom, inc_slot_hedge,
     inc_slot_mask) = slots
    a = slot_index.shape[1]
    he = hedge_slot_index.shape[1]
    im = inc_slot_mask[..., None]
    oa = ((inc_slot_atom[..., None] == jnp.arange(a)) & im).astype(dtype)
    oe = ((inc_slot_hedge[..., None] == jnp.arange(he)) & im).astype(dtype)
    return oa, oe


def _dense_reduce(o, vals, aggr):
    """Scatter entry values through a one-hot: [R,Ni,S]ᵀ·[R,Ni,d] → [R,S,d]."""
    import jax.numpy as jnp

    out = flop_tally.tally_einsum("rns,rnd->rsd", o, vals)
    if aggr == "mean":
        cnt = jnp.maximum(jnp.einsum("rns->rs", o), 1.0)
        out = out / cnt[..., None]
    return out


def _maybe_mlp(hid_dim, layers, dropout, normalization, axis_name, name):
    if layers > 0:
        return MLP(
            hidden_channels=hid_dim,
            out_channels=hid_dim,
            num_layers=layers,
            dropout=dropout,
            normalization=normalization,
            input_norm=False,
            axis_name=axis_name,
            name=name,
        )
    return None


class MHNNConv(nn.Module):
    """Full V→E→V bipartite pass with 4 MLPs (`reference conv.py:8-101`)."""

    hid_dim: int
    mlp1_layers: int = 1
    mlp2_layers: int = 1
    mlp3_layers: int = 1
    mlp4_layers: int = 1
    aggr: str = "mean"
    dropout: float = 0.0
    normalization: str = "None"
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x,  # [N_pad, d] node features
        e,  # [E_pad, d] hyperedge features
        vertex_idx,  # [nnz_pad]
        hedge_idx,  # [nnz_pad]
        inc_mask,  # [nnz_pad] bool
        atom_mask=None,
        hedge_mask=None,
        deterministic: bool = True,
        slots=None,  # dense slot-incidence view (structures.py) or None
    ):
        import jax.numpy as jnp

        d = self.hid_dim
        n_pad, e_pad = x.shape[-2], e.shape[-2]
        mk = lambda layers, name: _maybe_mlp(
            d, layers, self.dropout, self.normalization, self.axis_name, name
        )
        w1, w2, w3, w4 = (
            mk(self.mlp1_layers, "W1"),
            mk(self.mlp2_layers, "W2"),
            mk(self.mlp3_layers, "W3"),
            mk(self.mlp4_layers, "W4"),
        )
        apply_w = lambda w, inp, mask: (
            inp[..., d:] if w is None else w(inp, mask=mask, deterministic=deterministic)
        )

        if slots is not None:
            # dense slot-incidence path (see MHNNSConv): reductions are
            # batched one-hot matmuls over per-row slots
            (slot_index, slot_mask, atom_row, atom_slot, hedge_slot_index,
             hedge_slot_mask, hedge_row, hedge_slot, _a, _h,
             inc_slot_mask) = slots
            oa, oe = _slot_onehots(slots, x.dtype)
            smf = slot_mask[..., None].astype(x.dtype)
            hmf = hedge_slot_mask[..., None].astype(x.dtype)
            x_ent = lambda: flop_tally.tally_einsum(
                "rna,rad->rnd", oa, x[slot_index] * smf
            )
            e_ent = lambda: flop_tally.tally_einsum(
                "rne,red->rnd", oe, e[hedge_slot_index] * hmf
            )
            # V→E messages
            mve = apply_w(
                w1, jnp.concatenate([x_ent(), e_ent()], -1), inc_slot_mask
            )
            me_d = _dense_reduce(oe, mve, self.aggr)  # [R, He, d]
            me = me_d[hedge_row, hedge_slot]
            if hedge_mask is not None:
                # padded hyperedges point at (R-1, 0), which can hold a real
                # message — zero them to keep the e tensor flat-path-identical
                me = me * hedge_mask[..., None].astype(me.dtype)
            e = apply_w(w2, jnp.concatenate([e, me], -1), hedge_mask)
            # E→V messages
            mev = apply_w(
                w3, jnp.concatenate([x_ent(), e_ent()], -1), inc_slot_mask
            )
            sv = flop_tally.tally_einsum("rna,rnd->rad", oa, mev)
            if self.aggr == "mean":
                cnt = jnp.maximum(jnp.einsum("rna->ra", oa), 1.0)
                sv = sv / cnt[..., None]
            mv = sv[atom_row, atom_slot]
        else:
            # V→E messages
            mve = apply_w(
                w1, jnp.concatenate([x[vertex_idx], e[hedge_idx]], -1), inc_mask
            )
            me = masked_segment_reduce(
                mve, hedge_idx, e_pad, self.aggr, mask=inc_mask, sorted_ids=True
            )
            e = apply_w(w2, jnp.concatenate([e, me], -1), hedge_mask)
            # E→V messages
            mev = apply_w(
                w3, jnp.concatenate([x[vertex_idx], e[hedge_idx]], -1), inc_mask
            )
            mv = masked_segment_reduce(
                mev, vertex_idx, n_pad, self.aggr, mask=inc_mask
            )
        x = apply_w(w4, jnp.concatenate([x, mv], -1), atom_mask)
        return x, e


class MHNNSConv(nn.Module):
    """Simple/fast variant with residual mixing (`reference conv.py:104-182`)."""

    hid_dim: int
    mlp1_layers: int = 1
    mlp2_layers: int = 1
    mlp3_layers: int = 1
    aggr: str = "mean"
    alpha: float = 0.5
    dropout: float = 0.0
    normalization: str = "None"
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x,  # [N_pad, d]
        vertex_idx,
        hedge_idx,
        inc_mask,
        x0,  # [N_pad, d] initial features for the residual mix
        num_hedges: int,  # static E_pad (hyperedge slot count)
        atom_mask=None,
        deterministic: bool = True,
        slots=None,  # dense slot-incidence view (structures.py) or None
    ):
        import jax.numpy as jnp

        d = self.hid_dim
        n_pad = x.shape[-2]
        mk = lambda layers, name: _maybe_mlp(
            d, layers, self.dropout, self.normalization, self.axis_name, name
        )
        w1, w2, w3 = (
            mk(self.mlp1_layers, "W1"),
            mk(self.mlp2_layers, "W2"),
            mk(self.mlp3_layers, "W3"),
        )

        xw = x if w1 is None else w1(x, mask=atom_mask, deterministic=deterministic)
        if slots is not None:
            # dense slot-incidence path: the V→E and E→V reductions are
            # batched one-hot matmuls over per-row slots (same sums/counts as
            # the flat segment path — exact up to fp association)
            (slot_index, slot_mask, atom_row, atom_slot, *_rest) = slots
            oa, oe = _slot_onehots(slots, x.dtype)
            smf = slot_mask[..., None].astype(x.dtype)
            xw_d = xw[slot_index] * smf
            x_d = x[slot_index] * smf
            xve_d = flop_tally.tally_einsum("rna,rad->rnd", oa, xw_d)
            xe_d = _dense_reduce(oe, xve_d, self.aggr)  # [R, He, d]
            xev = jnp.concatenate(
                [
                    flop_tally.tally_einsum("rna,rad->rnd", oa, x_d),
                    flop_tally.tally_einsum("rne,red->rnd", oe, xe_d),
                ],
                -1,
            )
            inc_slot_mask = slots[-1]
            xev = (
                xev[..., d:]
                if w2 is None
                else w2(xev, mask=inc_slot_mask, deterministic=deterministic)
            )
            sv = flop_tally.tally_einsum("rna,rnd->rad", oa, xev)
            if self.aggr == "mean":
                cnt = jnp.maximum(jnp.einsum("rna->ra", oa), 1.0)
                sv = sv / cnt[..., None]
            xv = sv[atom_row, atom_slot]
        else:
            xve = xw[vertex_idx]
            xe = masked_segment_reduce(
                xve, hedge_idx, num_hedges, self.aggr, mask=inc_mask,
                sorted_ids=True,
            )
            xev = jnp.concatenate([x[vertex_idx], xe[hedge_idx]], -1)
            xev = (
                xev[..., d:]
                if w2 is None
                else w2(xev, mask=inc_mask, deterministic=deterministic)
            )
            xv = masked_segment_reduce(
                xev, vertex_idx, n_pad, self.aggr, mask=inc_mask
            )

        x = (1.0 - self.alpha) * xv + self.alpha * x0
        if w3 is not None:
            x = w3(x, mask=atom_mask, deterministic=deterministic)
        return x
