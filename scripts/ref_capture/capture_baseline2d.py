"""Capture PyTorch-reference goldens for the 2-D GNN baselines
(GIN / GCN / GAT / GATv2).

Runs the reference `GNN_2D` (`/root/reference/equihgnn/models/
baseline_2d.py:19-206`) under CPU torch. The only shimmed machinery on this
path is `MessagePassing` (source_to_target gather + scatter-add — the exact
PyG semantics for these convs), `degree`, the pooling functions, the OGB
encoders, and — since PyG wheels are not in this image — torch
reimplementations of `GATConv`/`GATv2Conv` with PyG's documented semantics
(shims.py states each contract). The GAT goldens therefore pin agreement
between two INDEPENDENT implementations (torch edge-list vs JAX dense
head-batched) of the same published math, not against PyG binaries.

Linear biases are randomized before capture so bias-handling bugs are
binding (all-zero biases would pass silently — this is how the GATv2
lin_l/lin_r bias=True default was caught, VERDICT round-2 #4).

Usage: python scripts/ref_capture/capture_baseline2d.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.dirname(__file__))

import shims  # noqa: E402

shims.install()

import torch  # noqa: E402

from capture_core import randomize_bn_stats, save, state_arrays  # noqa: E402
from equihgnn.models.baseline_2d import GNN_2D  # noqa: E402

from equihgnn_tpu.data.synthetic import make_synthetic_dataset  # noqa: E402


class GraphData:
    def __init__(self, samples):
        xs, srcs, dsts, efs, batch = [], [], [], [], []
        a0 = 0
        for g, s in enumerate(samples):
            xs.append(s.atom_feat)
            srcs.append(s.edge_src + a0)
            dsts.append(s.edge_dst + a0)
            efs.append(s.edge_feat)
            batch.append(np.full(s.n_atoms, g))
            a0 += s.n_atoms
        self.x = torch.from_numpy(np.concatenate(xs).astype(np.int64))
        self.edge_index = torch.from_numpy(
            np.stack([np.concatenate(srcs), np.concatenate(dsts)]).astype(np.int64)
        )
        self.edge_attr = torch.from_numpy(np.concatenate(efs).astype(np.int64))
        self.batch = torch.from_numpy(np.concatenate(batch).astype(np.int64))

    def arrays(self):
        return {
            "in::x": self.x.numpy(),
            "in::edge_index": self.edge_index.numpy(),
            "in::edge_attr": self.edge_attr.numpy(),
            "in::batch": self.batch.numpy(),
        }


def randomize_biases(mod: torch.nn.Module, gen: torch.Generator):
    """Zero-initialized Linear biases hide bias-handling bugs in the
    framework mapping; give them non-trivial values before capture."""
    for m in mod.modules():
        if isinstance(m, torch.nn.Linear) and m.bias is not None:
            m.bias.data.copy_(torch.randn(m.bias.shape, generator=gen) * 0.2)


def capture(gnn_type: str, jk="last", pooling="mean", num_layer=3, emb_dim=64):
    samples = make_synthetic_dataset(6, seed=71, hyper=False)
    data = GraphData(samples)
    torch.manual_seed(83)
    model = GNN_2D(1, num_layer=num_layer, emb_dim=emb_dim, gnn_type=gnn_type,
                   JK=jk, graph_pooling=pooling)
    gen = torch.Generator().manual_seed(89)
    randomize_bn_stats(model, gen)
    if gnn_type in ("gat", "gatv2"):
        randomize_biases(model, gen)
    model.eval()
    with torch.no_grad():
        out = model(data)
    payload = {**data.arrays(), "out::y": out.numpy(), **state_arrays(model)}
    # train-mode pass exercises live BN statistics through every conv + trunk
    m2 = GNN_2D(1, num_layer=num_layer, emb_dim=emb_dim, gnn_type=gnn_type,
                JK=jk, graph_pooling=pooling)
    m2.load_state_dict(model.state_dict())
    m2.train()
    with torch.no_grad():
        yt = m2(data)
    payload["out::y_train"] = yt.numpy()
    name = f"model_{gnn_type}_{jk}_{pooling}"
    save(name, payload)


if __name__ == "__main__":
    torch.set_num_threads(4)
    capture("gin", jk="last", pooling="mean")
    capture("gin", jk="sum", pooling="sum")
    capture("gcn", jk="last", pooling="mean")
    capture("gat", jk="last", pooling="mean")
    capture("gatv2", jk="last", pooling="mean")
