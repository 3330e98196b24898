"""Minimal torch shims that let the PyTorch reference at /root/reference run
under plain CPU torch (no torch_scatter / torch_geometric / ogb wheels).

Each shim implements exactly the API surface the reference touches, with the
documented upstream semantics — they are the *only* non-reference code on the
golden-capture path, so each one states its contract:

- ``torch_scatter.scatter(src, index, dim, dim_size, reduce)``:
  segment sum/mean along ``dim`` (upstream rusty1s/pytorch_scatter).
- ``ogb.graphproppred.mol_encoder.AtomEncoder/BondEncoder``: one
  ``nn.Embedding`` per categorical feature column (vocab sizes =
  OGB ``get_atom/bond_feature_dims()``), outputs summed.
- ``torch_geometric.nn.MessagePassing`` (flow source_to_target, aggr="add"):
  ``propagate(edge_index, **kw)`` gathers ``*_j`` args at ``edge_index[0]``,
  calls ``message``, scatter-adds to ``edge_index[1]`` (size = x rows), then
  ``update``.
- ``torch_geometric.nn.global_{add,mean,max}_pool``: segment pools by batch.
- ``torch_geometric.utils.degree / scatter / to_dense_batch``: as upstream.

Parents of the reference package are pre-registered so leaf modules import
without executing ``equihgnn.models.__init__`` (which would pull every
encoder and its heavy deps at once).
"""

from __future__ import annotations

import sys
import types

import torch
import torch.nn as nn

REF_ROOT = "/root/reference"

ATOM_FEATURE_DIMS = [119, 4, 12, 12, 10, 6, 6, 2, 2]
BOND_FEATURE_DIMS = [5, 6, 2]


# ---------------------------------------------------------------- torch_scatter
def scatter(src, index, dim=-1, out=None, dim_size=None, reduce="sum"):
    assert out is None
    if dim < 0:
        dim = src.dim() + dim
    size = int(dim_size) if dim_size is not None else int(index.max().item()) + 1
    shape = list(src.shape)
    shape[dim] = size
    if index.dim() == 1:
        # torch_scatter broadcasting: 1-D index aligns with `dim` and
        # broadcasts across all other axes (incl. leading batch dims —
        # equiformer_equihnns keeps type0's [1, N, C] through the trunk)
        view = [1] * src.dim()
        view[dim] = -1
        idx = index.reshape(view).expand_as(src)
    else:
        idx = index
        for _ in range(src.dim() - index.dim()):
            idx = idx.unsqueeze(-1)
        idx = idx.expand_as(src)
    if reduce in ("sum", "add"):
        return torch.zeros(shape, dtype=src.dtype).scatter_add_(dim, idx, src)
    if reduce == "mean":
        s = torch.zeros(shape, dtype=src.dtype).scatter_add_(dim, idx, src)
        cnt = torch.zeros(shape, dtype=src.dtype).scatter_add_(
            dim, idx, torch.ones_like(src)
        )
        return s / cnt.clamp(min=1)
    if reduce == "max":
        base = torch.full(shape, float("-inf"), dtype=src.dtype)
        out = base.scatter_reduce_(dim, idx, src, reduce="amax", include_self=True)
        return out.masked_fill(out == float("-inf"), 0.0)
    raise NotImplementedError(reduce)


# ------------------------------------------------------------------ ogb encoders
class AtomEncoder(nn.Module):
    def __init__(self, emb_dim):
        super().__init__()
        self.atom_embedding_list = nn.ModuleList()
        for d in ATOM_FEATURE_DIMS:
            emb = nn.Embedding(d, emb_dim)
            nn.init.xavier_uniform_(emb.weight.data)
            self.atom_embedding_list.append(emb)

    def forward(self, x):
        out = 0
        for i in range(x.shape[1]):
            out = out + self.atom_embedding_list[i](x[:, i])
        return out


class BondEncoder(nn.Module):
    def __init__(self, emb_dim):
        super().__init__()
        self.bond_embedding_list = nn.ModuleList()
        for d in BOND_FEATURE_DIMS:
            emb = nn.Embedding(d, emb_dim)
            nn.init.xavier_uniform_(emb.weight.data)
            self.bond_embedding_list.append(emb)

    def forward(self, edge_attr):
        out = 0
        for i in range(edge_attr.shape[1]):
            out = out + self.bond_embedding_list[i](edge_attr[:, i])
        return out


# ---------------------------------------------------------- torch_geometric bits
class MessagePassing(nn.Module):
    """source_to_target flow, "add" aggregation, PyG suffix convention:
    a message/edge_update argument `foo_j` gathers kwarg `foo` at the edge
    SOURCE (edge_index[0]), `foo_i` at the TARGET (edge_index[1]); other
    names pass through as edge-level tensors. Aggregation scatter-adds to
    the target (overridable via `aggregate`, as ViS_MP does for its tuple
    messages — `visnet_layer.py:669-679`)."""

    def __init__(self, aggr="add", flow="source_to_target", node_dim=0):
        super().__init__()
        assert aggr == "add"
        self.aggr = aggr
        self.node_dim = node_dim

    def _resolve(self, fn, edge_index, kwargs):
        import inspect

        src, dst = edge_index[0], edge_index[1]
        call = {}
        n_nodes = None
        for name in inspect.signature(fn).parameters:
            if name in ("ptr", "dim_size", "index"):
                continue
            if name.endswith("_j") and name[:-2] in kwargs:
                call[name] = kwargs[name[:-2]][src]
                n_nodes = kwargs[name[:-2]].shape[0]
            elif name.endswith("_i") and name[:-2] in kwargs:
                call[name] = kwargs[name[:-2]][dst]
                n_nodes = kwargs[name[:-2]].shape[0]
            elif name in kwargs:
                call[name] = kwargs[name]
        if n_nodes is None:
            n_nodes = int(dst.max().item()) + 1
        return call, n_nodes

    def propagate(self, edge_index, **kwargs):
        call, n_nodes = self._resolve(self.message, edge_index, kwargs)
        msgs = self.message(**call)
        out = self.aggregate(msgs, edge_index[1], None, n_nodes)
        return self.update(out)

    def edge_updater(self, edge_index, **kwargs):
        call, _ = self._resolve(self.edge_update, edge_index, kwargs)
        return self.edge_update(**call)

    def aggregate(self, msgs, index, ptr, dim_size):
        return scatter(msgs, index, dim=0, dim_size=dim_size, reduce="sum")

    def message(self, x_j):
        return x_j

    def update(self, aggr_out):
        return aggr_out


def radius_graph(x, r, batch=None, loop=False, max_num_neighbors=32,
                 flow="source_to_target"):
    """torch_cluster.radius_graph: all same-batch pairs within radius r,
    edge_index[0]=source/neighbor j, edge_index[1]=target/center i.
    torch_geometric's radius_graph calls radius() with a cap of
    max_num_neighbors (loop=True) or max_num_neighbors+1 (loop=False,
    self-loops removed afterwards); radius() truncates candidates in INDEX
    order, self-match included. nonzero() is row-major (j ascending within
    each center i), so a per-center rank < cap mask over the
    self-inclusive candidate set reproduces that truncation exactly."""
    n = x.shape[0]
    if batch is None:
        batch = torch.zeros(n, dtype=torch.long)
    d = torch.cdist(x, x)
    ok = (d <= r) & (batch.unsqueeze(0) == batch.unsqueeze(1))
    i_idx, j_idx = ok.nonzero(as_tuple=True)  # i = center row, j = neighbor
    counts = torch.bincount(i_idx, minlength=n)
    offsets = torch.cumsum(counts, 0) - counts
    rank = torch.arange(i_idx.numel()) - offsets[i_idx]
    keep = rank < (max_num_neighbors if loop else max_num_neighbors + 1)
    if not loop:
        keep &= i_idx != j_idx
    i_idx, j_idx = i_idx[keep], j_idx[keep]
    assert flow == "source_to_target"
    return torch.stack([j_idx, i_idx], dim=0)


class GatedEquivariantBlock(nn.Module):
    """torch_geometric.nn.models.visnet.GatedEquivariantBlock (PaiNN-style):
    vec norms gate a scalar/vector update MLP."""

    def __init__(self, hidden_channels, out_channels,
                 intermediate_channels=None, scalar_activation=False):
        super().__init__()
        self.out_channels = out_channels
        intermediate_channels = intermediate_channels or hidden_channels
        self.vec1_proj = nn.Linear(hidden_channels, hidden_channels, bias=False)
        self.vec2_proj = nn.Linear(hidden_channels, out_channels, bias=False)
        self.update_net = nn.Sequential(
            nn.Linear(hidden_channels * 2, intermediate_channels),
            nn.SiLU(),
            nn.Linear(intermediate_channels, out_channels * 2),
        )
        self.act = nn.SiLU() if scalar_activation else None

    def reset_parameters(self):
        nn.init.xavier_uniform_(self.vec1_proj.weight)
        nn.init.xavier_uniform_(self.vec2_proj.weight)
        nn.init.xavier_uniform_(self.update_net[0].weight)
        self.update_net[0].bias.data.zero_()
        nn.init.xavier_uniform_(self.update_net[2].weight)
        self.update_net[2].bias.data.zero_()

    def forward(self, x, v):
        vec1 = torch.norm(self.vec1_proj(v), dim=-2)
        vec2 = self.vec2_proj(v)
        x = torch.cat([x, vec1], dim=-1)
        x, v_gate = torch.split(self.update_net(x), self.out_channels, dim=-1)
        v = v_gate.unsqueeze(1) * vec2
        if self.act is not None:
            x = self.act(x)
        return x, v


def degree(index, num_nodes=None, dtype=None):
    n = int(num_nodes) if num_nodes is not None else int(index.max()) + 1
    out = torch.zeros(n, dtype=dtype or torch.long)
    return out.scatter_add_(0, index, torch.ones_like(index, dtype=out.dtype))


def global_add_pool(x, batch, size=None):
    # PyG pools over dim=-2: keeps leading batch dims (equiformer_equihnns
    # carries type0's [1, N, C] through the trunk)
    return scatter(x, batch, dim=-2, dim_size=size, reduce="sum")


def global_mean_pool(x, batch, size=None):
    return scatter(x, batch, dim=-2, dim_size=size, reduce="mean")


def global_max_pool(x, batch, size=None):
    return scatter(x, batch, dim=-2, dim_size=size, reduce="max")


def to_dense_batch(x, batch=None, fill_value=0.0, max_num_nodes=None, batch_size=None):
    if batch is None:
        batch = torch.zeros(x.shape[0], dtype=torch.long)
    bs = int(batch_size) if batch_size is not None else int(batch.max()) + 1
    counts = torch.bincount(batch, minlength=bs)
    m = int(max_num_nodes) if max_num_nodes is not None else int(counts.max())
    cum = torch.cumsum(counts, 0) - counts
    pos = torch.arange(x.shape[0]) - cum[batch]
    out = torch.full((bs, m, *x.shape[1:]), fill_value, dtype=x.dtype)
    mask = torch.zeros(bs, m, dtype=torch.bool)
    out[batch, pos] = x
    mask[batch, pos] = True
    return out, mask


def _add_self_loops_mean(edge_index, edge_attr, num_nodes):
    """torch_geometric.utils.add_self_loops with fill_value='mean': the
    self-loop attribute of node i is the scatter-mean of the attributes of
    edges INTO i (edge_index[1]); nodes with no incoming edges get zeros."""
    loop_attr = scatter(
        edge_attr, edge_index[1], dim=0, dim_size=num_nodes, reduce="mean"
    )
    loop = torch.arange(num_nodes, dtype=edge_index.dtype)
    edge_index = torch.cat([edge_index, torch.stack([loop, loop])], dim=1)
    edge_attr = torch.cat([edge_attr, loop_attr], dim=0)
    return edge_index, edge_attr


def _segment_softmax(alpha, index, num_nodes):
    """torch_geometric.utils.softmax: per-target-segment softmax."""
    m = scatter(alpha, index, dim=0, dim_size=num_nodes, reduce="max")
    ex = torch.exp(alpha - m[index])
    denom = scatter(ex, index, dim=0, dim_size=num_nodes, reduce="sum")
    return ex / denom[index].clamp(min=1e-16)


class GATConv(nn.Module):
    """torch_geometric.nn.GATConv for the reference's config
    (`reference baseline_2d.py:122-124`: heads=4, concat=False,
    edge_dim=emb_dim, defaults add_self_loops=True / fill_value='mean' /
    negative_slope=0.2 / dropout=0 / bias=True). PyG 2.x semantics: shared
    bias-free `lin` for src/dst (int in_channels), per-head attention vectors
    att_src/att_dst/att_edge, LeakyReLU logits, softmax over incoming
    edges ∪ {self-loop}, head MEAN (concat=False), then bias."""

    def __init__(self, in_channels, out_channels, heads=1, concat=True,
                 edge_dim=None, negative_slope=0.2):
        super().__init__()
        assert not concat and edge_dim is not None
        h, c = heads, out_channels
        self.heads, self.out_channels = h, c
        self.negative_slope = negative_slope
        self.lin = nn.Linear(in_channels, h * c, bias=False)
        self.lin_edge = nn.Linear(edge_dim, h * c, bias=False)
        self.att_src = nn.Parameter(torch.empty(1, h, c))
        self.att_dst = nn.Parameter(torch.empty(1, h, c))
        self.att_edge = nn.Parameter(torch.empty(1, h, c))
        self.bias = nn.Parameter(torch.zeros(c))
        nn.init.xavier_uniform_(self.lin.weight)
        nn.init.xavier_uniform_(self.lin_edge.weight)
        nn.init.xavier_uniform_(self.att_src)
        nn.init.xavier_uniform_(self.att_dst)
        nn.init.xavier_uniform_(self.att_edge)

    def forward(self, x, edge_index, edge_attr):
        h, c = self.heads, self.out_channels
        n = x.shape[0]
        edge_index, edge_attr = _add_self_loops_mean(edge_index, edge_attr, n)
        src, dst = edge_index[0], edge_index[1]
        xs = self.lin(x).view(n, h, c)
        a_src = (xs * self.att_src).sum(-1)  # [n, h]
        a_dst = (xs * self.att_dst).sum(-1)
        ea = self.lin_edge(edge_attr).view(-1, h, c)
        alpha = a_src[src] + a_dst[dst] + (ea * self.att_edge).sum(-1)
        alpha = torch.nn.functional.leaky_relu(alpha, self.negative_slope)
        alpha = _segment_softmax(alpha, dst, n)
        out = scatter(
            alpha.unsqueeze(-1) * xs[src], dst, dim=0, dim_size=n, reduce="sum"
        )
        return out.mean(dim=1) + self.bias


class GATv2Conv(nn.Module):
    """torch_geometric.nn.GATv2Conv for the reference's config
    (`reference baseline_2d.py:126-128`). PyG defaults: share_weights=False
    (separate lin_l/lin_r, BOTH bias=True), bias-free lin_edge, single
    per-head `att` applied after LeakyReLU(x_l[src]+x_r[dst]+edge); message
    value is the lin_l-transformed source; head mean; final bias."""

    def __init__(self, in_channels, out_channels, heads=1, concat=True,
                 edge_dim=None, negative_slope=0.2):
        super().__init__()
        assert not concat and edge_dim is not None
        h, c = heads, out_channels
        self.heads, self.out_channels = h, c
        self.negative_slope = negative_slope
        self.lin_l = nn.Linear(in_channels, h * c, bias=True)
        self.lin_r = nn.Linear(in_channels, h * c, bias=True)
        self.lin_edge = nn.Linear(edge_dim, h * c, bias=False)
        self.att = nn.Parameter(torch.empty(1, h, c))
        self.bias = nn.Parameter(torch.zeros(c))
        nn.init.xavier_uniform_(self.lin_l.weight)
        nn.init.xavier_uniform_(self.lin_r.weight)
        nn.init.xavier_uniform_(self.lin_edge.weight)
        nn.init.xavier_uniform_(self.att)

    def forward(self, x, edge_index, edge_attr):
        h, c = self.heads, self.out_channels
        n = x.shape[0]
        edge_index, edge_attr = _add_self_loops_mean(edge_index, edge_attr, n)
        src, dst = edge_index[0], edge_index[1]
        xl = self.lin_l(x).view(n, h, c)
        xr = self.lin_r(x).view(n, h, c)
        ea = self.lin_edge(edge_attr).view(-1, h, c)
        z = torch.nn.functional.leaky_relu(
            xl[src] + xr[dst] + ea, self.negative_slope
        )
        alpha = (z * self.att).sum(-1)
        alpha = _segment_softmax(alpha, dst, n)
        out = scatter(
            alpha.unsqueeze(-1) * xl[src], dst, dim=0, dim_size=n, reduce="sum"
        )
        return out.mean(dim=1) + self.bias


class _Unused(nn.Module):
    """Placeholder for layers importable but untouched by captured configs."""

    def __init__(self, *a, **k):
        super().__init__()
        raise NotImplementedError("shim placeholder — not part of golden capture")


def _einx_get_at(pattern, t, idx):
    """einx.get_at for the patterns the reference uses
    (`reference equiformer_layer.py:356,1331-1342`): gather along the
    bracketed axis with all axes left of it treated as batch dims."""
    if pattern == "b [i] d m, b j k -> b j k d m":
        b = torch.arange(t.shape[0], device=idx.device)[:, None, None]
        return t[b, idx]
    if pattern in ("b i [j], b i k -> b i k", "b i [j] d, b i k -> b i k d",
                   "b i [j] c, b i k -> b i k c"):
        b = torch.arange(t.shape[0], device=idx.device)[:, None, None]
        i = torch.arange(t.shape[1], device=idx.device)[None, :, None]
        return t[b, i, idx]
    raise NotImplementedError(f"einx.get_at shim: pattern {pattern!r}")


class _TaylorSeriesLinearAttn(nn.Module):
    """Stub: the reference model configs never enable linear attention
    (num_linear_attn_heads=0, `reference equiformer_layer.py:625-641`)."""

    def __init__(self, *a, **k):
        super().__init__()
        raise NotImplementedError(
            "TaylorSeriesLinearAttn shim: reference configs keep "
            "num_linear_attn_heads=0"
        )


def install():
    """Register shim modules + reference package parents in sys.modules."""
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)

    # beartype: runtime type-checking decorator -> identity; beartype.typing
    # re-exports typing names (the reference only uses it for annotations).
    if "beartype" not in sys.modules:
        import typing

        bt = types.ModuleType("beartype")
        bt.beartype = lambda fn=None, **k: (fn if fn is not None
                                            else (lambda f: f))
        bt.typing = typing
        sys.modules["beartype"] = bt
        sys.modules["beartype.typing"] = typing

    ex = types.ModuleType("einx")
    ex.get_at = _einx_get_at
    sys.modules.setdefault("einx", ex)

    tsla = types.ModuleType("taylor_series_linear_attention")
    tsla.TaylorSeriesLinearAttn = _TaylorSeriesLinearAttn
    sys.modules.setdefault("taylor_series_linear_attention", tsla)

    ts = types.ModuleType("torch_scatter")
    ts.scatter = scatter
    sys.modules["torch_scatter"] = ts

    ogb = types.ModuleType("ogb")
    gpp = types.ModuleType("ogb.graphproppred")
    mec = types.ModuleType("ogb.graphproppred.mol_encoder")
    mec.AtomEncoder, mec.BondEncoder = AtomEncoder, BondEncoder
    ogb.graphproppred = gpp
    gpp.mol_encoder = mec
    sys.modules.update(
        {"ogb": ogb, "ogb.graphproppred": gpp, "ogb.graphproppred.mol_encoder": mec}
    )

    tg = types.ModuleType("torch_geometric")
    tgn = types.ModuleType("torch_geometric.nn")
    tga = types.ModuleType("torch_geometric.nn.aggr")
    tgu = types.ModuleType("torch_geometric.utils")
    tgm = types.ModuleType("torch_geometric.nn.models")
    tgv = types.ModuleType("torch_geometric.nn.models.visnet")
    tgn.MessagePassing = MessagePassing
    tgn.global_add_pool = global_add_pool
    tgn.global_mean_pool = global_mean_pool
    tgn.global_max_pool = global_max_pool
    tgn.GATConv = GATConv
    tgn.GATv2Conv = GATv2Conv
    tgn.GlobalAttention = _Unused
    tgn.radius_graph = radius_graph
    tga.Set2Set = _Unused
    tgu.degree = degree
    tgu.scatter = scatter
    tgu.to_dense_batch = to_dense_batch
    tgv.GatedEquivariantBlock = GatedEquivariantBlock
    tg.nn = tgn
    tgn.aggr = tga
    tgn.models = tgm
    tgm.visnet = tgv
    tg.utils = tgu
    sys.modules.update(
        {
            "torch_geometric": tg,
            "torch_geometric.nn": tgn,
            "torch_geometric.nn.aggr": tga,
            "torch_geometric.nn.models": tgm,
            "torch_geometric.nn.models.visnet": tgv,
            "torch_geometric.utils": tgu,
        }
    )

    # Pre-register reference package parents with __path__ but WITHOUT running
    # their __init__ (equihgnn.models.__init__ imports every encoder).
    for name, path in [
        ("equihgnn", f"{REF_ROOT}/equihgnn"),
        ("equihgnn.models", f"{REF_ROOT}/equihgnn/models"),
        ("equihgnn.models.layers", f"{REF_ROOT}/equihgnn/models/layers"),
        ("equihgnn.data", f"{REF_ROOT}/equihgnn/data"),
        ("equihgnn.utils", f"{REF_ROOT}/equihgnn/utils"),
    ]:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__path__ = [path]
            sys.modules[name] = mod
