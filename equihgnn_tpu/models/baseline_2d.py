"""2-D GNN baselines: GIN / GCN / GAT / GATv2 on plain molecular graphs.

TPU re-design of `reference equihgnn/models/baseline_2d.py:19-206`. The PyG
MessagePassing scatters become masked segment reductions over the padded
`GraphBatch` edge lists; PyG's GATConv/GATv2Conv (heads=4, concat=False,
edge_dim=emb_dim, add_self_loops with fill_value='mean') are reimplemented
with an explicit self-loop term folded into the segment softmax so edge-array
shapes stay static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from equihgnn_tpu.common.registry import registry
from equihgnn_tpu.data.structures import GraphBatch
from equihgnn_tpu.models.common import flat_pred, global_pool
from equihgnn_tpu.models.config import ModelConfig
from equihgnn_tpu.nn.encoders import AtomEncoder, BondEncoder
from equihgnn_tpu.nn.mlp import MaskedBatchNorm, TorchLinear
from equihgnn_tpu.ops.segment import segment_count, segment_max, segment_sum


class Set2Set(nn.Module):
    """Set2Set pooling (`torch_geometric.nn.aggr.Set2Set` with
    processing_steps=2, used by `reference baseline_2d.py:160-161`)."""

    emb_dim: int
    processing_steps: int = 2

    @nn.compact
    def __call__(self, x, graph_id, num_graphs: int, mask=None):
        from equihgnn_tpu.ops.segment import segment_softmax, segment_sum

        d = self.emb_dim
        cell = nn.LSTMCell(features=d, name="lstm")
        carry = (
            jnp.zeros((num_graphs, d), x.dtype),
            jnp.zeros((num_graphs, d), x.dtype),
        )
        q_star = jnp.zeros((num_graphs, 2 * d), x.dtype)
        for _ in range(self.processing_steps):
            carry, q = cell(carry, q_star)
            e = jnp.sum(x * q[graph_id], axis=-1, keepdims=True)
            a = segment_softmax(e, graph_id, num_graphs, mask=mask)
            r = segment_sum(a * x, graph_id, num_graphs, mask=mask)
            q_star = jnp.concatenate([q, r], axis=-1)
        return q_star


class GINConv(nn.Module):
    """`reference baseline_2d.py:19-46`: mlp((1+eps)x + Σ_j relu(x_j + e_ij))."""

    emb_dim: int
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, edge_src, edge_dst, edge_attr, edge_mask, atom_mask, deterministic):
        eps = self.param("eps", nn.initializers.zeros, ())
        msg = nn.relu(x[edge_src] + edge_attr)
        agg = segment_sum(msg, edge_dst, x.shape[-2], mask=edge_mask)
        h = (1.0 + eps) * x + agg
        h = TorchLinear(self.emb_dim, name="mlp_lin0")(h)
        h = MaskedBatchNorm(axis_name=self.axis_name, name="mlp_bn")(
            h, mask=atom_mask, use_running_average=deterministic
        )
        h = nn.relu(h)
        h = TorchLinear(self.emb_dim, name="mlp_lin1")(h)
        return h


class GCNConv(nn.Module):
    """`reference baseline_2d.py:49-74`: symmetric-normalized conv + root term."""

    emb_dim: int

    @nn.compact
    def __call__(self, x, edge_src, edge_dst, edge_attr, edge_mask, atom_mask, deterministic):
        n = x.shape[-2]
        x = TorchLinear(self.emb_dim, name="linear")(x)
        root_emb = self.param(
            "root_emb", nn.initializers.normal(stddev=1.0), (self.emb_dim,)
        )
        deg = segment_count(edge_src, n, mask=edge_mask) + 1.0
        dinv = jax.lax.rsqrt(deg)
        norm = (dinv[edge_src] * dinv[edge_dst])[:, None]
        msg = norm * nn.relu(x[edge_src] + edge_attr)
        out = segment_sum(msg, edge_dst, n, mask=edge_mask)
        out = out + nn.relu(x + root_emb) / deg[:, None]
        return out


class _GATBase(nn.Module):
    """Shared machinery for GAT / GATv2 with static-shape self-loops.

    PyG semantics replicated: heads=4, concat=False (head mean), edge features
    enter only the attention logits, self-loops added with edge feature =
    mean of the node's incoming real edge features (fill_value='mean'),
    LeakyReLU(0.2) logits, softmax over incoming edges ∪ {self}.
    """

    emb_dim: int
    heads: int = 4
    v2: bool = False
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x, edge_src=None, edge_dst=None, edge_attr=None,
                 edge_mask=None, atom_mask=None, deterministic=True,
                 dense=None):
        h, f = self.heads, self.emb_dim
        glorot = nn.initializers.xavier_uniform()
        d_edge = (dense[1] if dense is not None else edge_attr).shape[-1]
        e_w = self.param("lin_edge_kernel", glorot, (d_edge, h * f))
        lrelu = lambda v: nn.leaky_relu(v, negative_slope=self.negative_slope)
        bias = self.param("bias", nn.initializers.zeros, (f,))
        if not self.v2:
            att_src = self.param("att_src", glorot, (1, h, f))
            att_dst = self.param("att_dst", glorot, (1, h, f))
            att_edge = self.param("att_edge", glorot, (1, h, f))
        else:
            att = self.param("att", glorot, (1, h, f))

        if dense is not None:
            # Fully-dense per-molecule attention (round 4): node features,
            # edge features, softmax, and aggregation all live in
            # [G, A]/[G, Me] layouts — zero gathers or scatters anywhere in
            # the layer (XLA TPU scatters are near-serial; both the flat
            # segment path and a per-layer slot-gather variant were
            # measured slower — PERF.md). Computation is HEAD-MAJOR:
            # [·, heads, f] tensors tile as T(4,128) (2.5× physical HBM
            # waste); per-head [·, f] slices stay T(8,128), and v1's edge
            # projection collapses to one vector dot per head.
            x_d, eattr_d, oh_src, oh_dst, slot_mask = dense
            g_, me_, a_ = oh_src.shape
            smf = slot_mask.astype(x_d.dtype)
            emask = (jnp.sum(oh_src, axis=-1) > 0).astype(x_d.dtype)  # [G, Me]
            if not self.v2:
                xs2d = TorchLinear(h * f, use_bias=False, kernel_init=glorot,
                                   name="lin")(x_d)
                xd2d = xs2d
            else:
                # PyG GATv2Conv defaults bias=True on lin_l/lin_r; the bias
                # does NOT cancel in the logits (LeakyReLU is nonlinear) —
                # caught by the reference golden (VERDICT round-2 #4).
                xs2d = TorchLinear(h * f, kernel_init=glorot,
                                   name="lin_l")(x_d)
                xd2d = TorchLinear(h * f, kernel_init=glorot,
                                   name="lin_r")(x_d)
            cnt_in = jnp.maximum(jnp.einsum("gma->ga", oh_dst), 1.0)
            mean_in_d = (
                jnp.einsum("gma,gmd->gad", oh_dst, eattr_d) / cnt_in[..., None]
            )
            neg = jnp.finfo(x_d.dtype).min
            # HEAD-BATCHED (round 5): the earlier per-head Python loop issued
            # 4× small [G,Me,A]-sized einsums; batching the head axis into
            # each contraction issues the same FLOPs as few large matmuls
            # (gatv2's per-edge z tensor is one [G,Me,h·f] op instead of four
            # [G,Me,f] chains — bench_2d.py gatv2 8.7k → see BENCH).
            xs4 = xs2d.reshape(g_, a_, h, f)
            xd4 = xd2d.reshape(g_, a_, h, f)
            if not self.v2:
                a_src = jnp.einsum("gahf,hf->gah", xs4, att_src[0])
                a_dst = jnp.einsum("gahf,hf->gah", xd4, att_dst[0])
                ev = jnp.einsum(
                    "dhf,hf->dh", e_w.reshape(d_edge, h, f), att_edge[0]
                )  # [d_edge, h]
                logits = lrelu(
                    jnp.einsum("gma,gah->gmh", oh_src, a_src)
                    + jnp.einsum("gma,gah->gmh", oh_dst, a_dst)
                    + eattr_d @ ev
                )  # [G, Me, h]
                self_l = lrelu(a_src + a_dst + mean_in_d @ ev)  # [G, A, h]
            else:
                z = lrelu(
                    jnp.einsum("gma,gak->gmk", oh_src, xs2d)
                    + jnp.einsum("gma,gak->gmk", oh_dst, xd2d)
                    + eattr_d @ e_w
                ).reshape(g_, me_, h, f)
                logits = jnp.einsum("gmhf,hf->gmh", z, att[0])
                zs = lrelu(xs2d + xd2d + mean_in_d @ e_w).reshape(
                    g_, a_, h, f
                )
                self_l = jnp.einsum("gahf,hf->gah", zs, att[0])
            masked = jnp.where(
                oh_dst[..., None] > 0, logits[:, :, None, :], neg
            )  # [G, Me, A, h]
            m = jnp.maximum(jnp.max(masked, axis=1), self_l)  # [G, A, h]
            m_at_e = jnp.einsum("gma,gah->gmh", oh_dst, m)
            ex = jnp.exp(logits - m_at_e) * emask[..., None]  # [G, Me, h]
            ex_self = jnp.exp(self_l - m) * smf[..., None]  # [G, A, h]
            denom = jnp.einsum("gma,gmh->gah", oh_dst, ex) + ex_self
            attn = jnp.einsum("gmi,gmh,gmj->ghij", oh_dst, ex, oh_src)
            raw = jnp.einsum("ghij,gjhf->gihf", attn, xs4)
            out = (raw + ex_self[..., None] * xs4) / jnp.maximum(
                denom[..., None], 1e-16
            )
            return jnp.mean(out, axis=2) + bias  # [G, A, f]

        # flat segment path (fallback when the dense tables are absent)
        n = x.shape[-2]
        if not self.v2:
            xs2 = TorchLinear(h * f, use_bias=False, kernel_init=glorot,
                              name="lin")(x)  # [n, h*f]
            xd2 = xs2
        else:
            # PyG GATv2Conv default bias=True on lin_l/lin_r (see dense path)
            xs2 = TorchLinear(h * f, kernel_init=glorot, name="lin_l")(x)
            xd2 = TorchLinear(h * f, kernel_init=glorot, name="lin_r")(x)
        # self-loop edge feature: mean of incoming real edge features per node
        mean_in = segment_sum(edge_attr, edge_dst, n, mask=edge_mask)
        cnt_in = segment_count(edge_dst, n, mask=edge_mask)[:, None]
        mean_in = mean_in / jnp.maximum(cnt_in, 1.0)
        xs = xs2.reshape(n, h, f)
        xd = xd2.reshape(n, h, f)
        eattr = (edge_attr @ e_w).reshape(-1, h, f)
        eself = (mean_in @ e_w).reshape(n, h, f)
        if not self.v2:
            a_src = (xs * att_src).sum(-1)  # [n, h]
            a_dst = (xd * att_dst).sum(-1)
            esc = (eattr * att_edge).sum(-1)
            logits = lrelu(a_src[edge_src] + a_dst[edge_dst] + esc)
            self_logits = lrelu(a_src + a_dst + (eself * att_edge).sum(-1))
        else:
            z = lrelu(xs[edge_src] + xd[edge_dst] + eattr)
            logits = (z * att).sum(-1)
            zs = lrelu(xs + xd + eself)
            self_logits = (zs * att).sum(-1)

        neg = jnp.finfo(logits.dtype).min
        logits = jnp.where(edge_mask[:, None], logits, neg)
        seg_m = segment_max(logits, edge_dst, n, mask=edge_mask)
        m = jnp.maximum(seg_m, self_logits)
        ex = jnp.exp(logits - m[edge_dst]) * edge_mask[:, None]
        ex_self = jnp.exp(self_logits - m)
        denom = segment_sum(ex, edge_dst, n) + ex_self
        alpha = ex / jnp.maximum(denom[edge_dst], 1e-16)
        alpha_self = ex_self / jnp.maximum(denom, 1e-16)

        out = segment_sum(alpha[..., None] * xs[edge_src], edge_dst, n, mask=edge_mask)
        out = out + alpha_self[..., None] * xs
        out = out.mean(axis=1)  # concat=False → head mean
        return out + bias


@registry.register_model("gin")
@registry.register_model("gcn")
@registry.register_model("gat")
@registry.register_model("gatv2")
class GNN2D(nn.Module):
    """`reference baseline_2d.py:77-206` — JK + pooling + linear head."""

    num_target: int
    cfg: ModelConfig = ModelConfig()
    gnn_type: str = "gin"

    @nn.compact
    def __call__(self, batch: GraphBatch, deterministic: bool = True):
        cfg = self.cfg
        num_layer, emb_dim = cfg.gnn_num_layer, cfg.gnn_emb_dim
        if num_layer < 2:
            raise ValueError("Number of GNN layers must be greater than 1.")

        drop = nn.Dropout(cfg.dropout)
        use_dense = (
            self.gnn_type in ("gat", "gatv2")
            and batch.slot_index is not None
            and batch.eslot_src is not None
        )
        if use_dense:
            # Whole-network dense [G, A, ·] pipeline for the attention
            # baselines: atoms/edges are encoded directly in the dense
            # layout (int gathers only — no differentiable gather/scatter
            # anywhere between encoder and head; see _GATBase).
            smf = batch.slot_mask[..., None].astype(jnp.float32)
            x = AtomEncoder(emb_dim, name="atom_encoder")(
                batch.atom_feat[batch.slot_index]
            ) * smf
            eattr_d = BondEncoder(emb_dim, name="bond_encoder")(
                batch.edge_feat[batch.eslot_edge]
            ) * batch.eslot_mask[..., None].astype(jnp.float32)
            a_ = batch.slot_mask.shape[1]
            oh_src = (
                (batch.eslot_src[..., None] == jnp.arange(a_))
                & batch.eslot_mask[..., None]
            ).astype(jnp.float32)
            oh_dst = (
                (batch.eslot_dst[..., None] == jnp.arange(a_))
                & batch.eslot_mask[..., None]
            ).astype(jnp.float32)
            bn_mask = batch.slot_mask
        else:
            x = AtomEncoder(emb_dim, name="atom_encoder")(batch.atom_feat)
            edge_attr = BondEncoder(emb_dim, name="bond_encoder")(batch.edge_feat)
            bn_mask = batch.atom_mask

        h_list = [x]
        for layer in range(num_layer):
            if self.gnn_type == "gin":
                conv = GINConv(emb_dim, axis_name=cfg.axis_name, name=f"convs_{layer}")
            elif self.gnn_type == "gcn":
                conv = GCNConv(emb_dim, name=f"convs_{layer}")
            elif self.gnn_type == "gat":
                conv = _GATBase(emb_dim, heads=4, v2=False, name=f"convs_{layer}")
            elif self.gnn_type == "gatv2":
                conv = _GATBase(emb_dim, heads=4, v2=True, name=f"convs_{layer}")
            else:
                raise ValueError(f"Undefined GNN type called {self.gnn_type}")
            if use_dense:
                h = conv(
                    h_list[layer],
                    dense=(h_list[layer], eattr_d, oh_src, oh_dst,
                           batch.slot_mask),
                    deterministic=deterministic,
                )
            else:
                h = conv(
                    h_list[layer],
                    batch.edge_src,
                    batch.edge_dst,
                    edge_attr,
                    batch.edge_mask,
                    batch.atom_mask,
                    deterministic,
                )
            h = MaskedBatchNorm(axis_name=cfg.axis_name, name=f"batch_norms_{layer}")(
                h, mask=bn_mask, use_running_average=deterministic
            )
            if layer == num_layer - 1:
                h = drop(h, deterministic=deterministic)
            else:
                h = drop(nn.relu(h), deterministic=deterministic)
            if cfg.gnn_residual:
                h = h + h_list[layer]
            h_list.append(h)

        if cfg.gnn_jk == "last":
            h_node = h_list[-1]
        elif cfg.gnn_jk == "sum":
            h_node = sum(h_list)
        else:
            raise ValueError(f"Unknown JK mode {cfg.gnn_jk}")

        pooling = cfg.gnn_graph_pooling
        if use_dense:
            # dense masked pooling over the A axis (scatter-free); the [G]
            # row order IS the graph order (one row per molecule)
            smv = batch.slot_mask[..., None].astype(h_node.dtype)
            if pooling == "sum":
                hg = jnp.sum(h_node * smv, axis=1)
            elif pooling == "mean":
                cnt = jnp.maximum(jnp.sum(smv, axis=1), 1.0)
                hg = jnp.sum(h_node * smv, axis=1) / cnt
            elif pooling == "max":
                neg = jnp.finfo(h_node.dtype).min
                hg = jnp.max(jnp.where(smv > 0, h_node, neg), axis=1)
            else:
                # attention/set2set pooling: fall back to the flat layout
                h_node = h_node[batch.atom_graph_id, batch.atom_slot]
                use_dense = False
        if not use_dense and pooling in ("sum", "mean", "max"):
            hg = global_pool(
                h_node,
                batch.atom_graph_id,
                batch.num_graphs,
                mask=batch.atom_mask,
                reduce=pooling,
            )
        if not use_dense and pooling == "attention":
            gate = TorchLinear(2 * emb_dim, name="pool_gate_lin0")(h_node)
            gate = MaskedBatchNorm(axis_name=cfg.axis_name, name="pool_gate_bn")(
                gate, mask=batch.atom_mask, use_running_average=deterministic
            )
            gate = TorchLinear(1, name="pool_gate_lin1")(nn.relu(gate))
            from equihgnn_tpu.ops.segment import segment_softmax

            w = segment_softmax(
                gate, batch.atom_graph_id, batch.num_graphs, mask=batch.atom_mask
            )
            hg = segment_sum(
                w * h_node, batch.atom_graph_id, batch.num_graphs, mask=batch.atom_mask
            )
        if not use_dense and pooling == "set2set":
            hg = Set2Set(emb_dim, processing_steps=2, name="pool_set2set")(
                h_node, batch.atom_graph_id, batch.num_graphs, mask=batch.atom_mask
            )
        if pooling not in ("sum", "mean", "max", "attention", "set2set"):
            raise ValueError(f"Invalid graph pooling type {pooling!r}")

        out = TorchLinear(self.num_target, name="graph_pred_linear")(hg)
        return flat_pred(out)
