"""Capture PyTorch-reference goldens for the ViSNet encoder path.

Runs the full VisNetEquiHNNS hybrid (`/root/reference/equihgnn/models/
equihnn_visnet.py:84-160`) under CPU torch. ViSNet is the only encoder the
reference drives batch-aware (`data.batch` partitions neighborhoods), so a
multi-molecule golden works directly.

Shimmed on this path (shims.py documents each contract): generalized
MessagePassing (PyG `_i`/`_j` suffix gathers + custom aggregate /
edge_updater — exactly what ViS_MP uses), `radius_graph` (all same-batch
pairs within r; molecules are capped at 16 atoms so torch_cluster's
index-order neighbor cap never binds), and PyG's `GatedEquivariantBlock`.

Sign note: torch_cluster's edge convention makes the reference's edge vector
j−i while ours is i−j. Only the odd (l=1) spherical-harmonic block of d_ij
flips; every scalar readout path is even in that block (attention, vec_dot,
vector rejections, GatedEquivariantBlock norms), so per-node scalars — all
the hybrid consumes — agree exactly.

Usage: python scripts/ref_capture/capture_visnet.py
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

from capture_core import (  # noqa: E402
    Args,
    RefData,
    collate_reference_batch,
    save,
    state_arrays,
)
from equihgnn.models import equihnn_visnet as ref_mod  # noqa: E402

from equihgnn_tpu.data.synthetic import make_synthetic_dataset  # noqa: E402


def small_samples(n=6):
    out = [
        s for s in make_synthetic_dataset(40, seed=97)
        if s.n_atoms <= 16
    ]
    return out[:n]


def capture_visnet_model(vertex: bool):
    samples = small_samples()
    d = collate_reference_batch(samples)
    pos = np.concatenate([s.pos for s in samples]).astype(np.float32)
    data = RefData(d)
    data.pos = torch.from_numpy(pos)
    torch.manual_seed(101)
    cls = ref_mod.VisNetEquiHNN if vertex else ref_mod.VisNetEquiHNNS
    # (VisNetEquiHNN uses the full-MHNNConv trunk; both use ViS_MP — the
    # reference never instantiates ViS_MP_Vertex from any model config)
    model = cls(1, Args(normalization="ln"))
    model.eval()
    with torch.no_grad():
        out = model(data)
    name = "model_visnet_equihnn" if vertex else "model_visnet_equihnns"
    save(name, {
        **{f"in::{k}": v for k, v in d.items()},
        "in::pos": pos,
        "out::y": out.numpy(),
        **state_arrays(model),
    })


if __name__ == "__main__":
    torch.set_num_threads(4)
    capture_visnet_model(vertex=False)
