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
    def __call__(self, x, edge_src, edge_dst, edge_attr, edge_mask, atom_mask, deterministic):
        n = x.shape[-2]
        h, f = self.heads, self.emb_dim
        glorot = nn.initializers.xavier_uniform()

        if not self.v2:
            w = TorchLinear(h * f, use_bias=False, kernel_init=glorot, name="lin")
            xs = w(x).reshape(n, h, f)
            xd = xs
        else:
            xs = TorchLinear(h * f, use_bias=False, kernel_init=glorot, name="lin_l")(
                x
            ).reshape(n, h, f)
            xd = TorchLinear(h * f, use_bias=False, kernel_init=glorot, name="lin_r")(
                x
            ).reshape(n, h, f)

        e_proj = TorchLinear(
            h * f, use_bias=False, kernel_init=glorot, name="lin_edge"
        )
        eattr = e_proj(edge_attr).reshape(-1, h, f)
        # self-loop edge feature: mean of incoming real edge features per node
        mean_in = segment_sum(edge_attr, edge_dst, n, mask=edge_mask)
        cnt_in = segment_count(edge_dst, n, mask=edge_mask)[:, None]
        eself = e_proj(mean_in / jnp.maximum(cnt_in, 1.0)).reshape(n, h, f)

        lrelu = lambda v: nn.leaky_relu(v, negative_slope=self.negative_slope)
        if not self.v2:
            att_src = self.param("att_src", glorot, (1, h, f))
            att_dst = self.param("att_dst", glorot, (1, h, f))
            att_edge = self.param("att_edge", glorot, (1, h, f))
            a_src = (xs * att_src).sum(-1)  # [n, h]
            a_dst = (xd * att_dst).sum(-1)
            logits = lrelu(
                a_src[edge_src] + a_dst[edge_dst] + (eattr * att_edge).sum(-1)
            )
            self_logits = lrelu(a_src + a_dst + (eself * att_edge).sum(-1))
        else:
            att = self.param("att", glorot, (1, h, f))
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
        bias = self.param("bias", nn.initializers.zeros, (f,))
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

        x = AtomEncoder(emb_dim, name="atom_encoder")(batch.atom_feat)
        edge_attr = BondEncoder(emb_dim, name="bond_encoder")(batch.edge_feat)
        drop = nn.Dropout(cfg.dropout)

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
                h, mask=batch.atom_mask, use_running_average=deterministic
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
        if pooling in ("sum", "mean", "max"):
            hg = global_pool(
                h_node,
                batch.atom_graph_id,
                batch.num_graphs,
                mask=batch.atom_mask,
                reduce=pooling,
            )
        elif pooling == "attention":
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
        elif pooling == "set2set":
            hg = Set2Set(emb_dim, processing_steps=2, name="pool_set2set")(
                h_node, batch.atom_graph_id, batch.num_graphs, mask=batch.atom_mask
            )
        else:
            raise ValueError(f"Invalid graph pooling type {pooling!r}")

        out = TorchLinear(self.num_target, name="graph_pred_linear")(hg)
        return flat_pred(out)
