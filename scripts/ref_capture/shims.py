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
    return scatter(x, batch, dim=0, dim_size=size, reduce="sum")


def global_mean_pool(x, batch, size=None):
    return scatter(x, batch, dim=0, dim_size=size, reduce="mean")


def global_max_pool(x, batch, size=None):
    return scatter(x, batch, dim=0, dim_size=size, reduce="max")


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


class _Unused(nn.Module):
    """Placeholder for layers importable but untouched by captured configs."""

    def __init__(self, *a, **k):
        super().__init__()
        raise NotImplementedError("shim placeholder — not part of golden capture")


def install():
    """Register shim modules + reference package parents in sys.modules."""
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)

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
    tgn.GATConv = _Unused
    tgn.GATv2Conv = _Unused
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
