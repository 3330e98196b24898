"""Capture PyTorch-reference goldens for the FAFormer encoder path.

Runs the reference FAFormer (`/root/reference/equihgnn/models/layers/
fa_former_layer.py:621-716`) and the FAFormerEquiHNNS hybrid
(`equihnn_fa_former.py:105-190`) under CPU torch.

Determinism notes:
  - Frame averaging enumerates all 8 eigenvector sign combinations, so
    `torch.linalg.eigh` vs our closed-form eigh3 sign choices cancel; only
    eigenvalue ORDER matters (ascending in both). Coordinates are scaled
    anisotropically so eigenvalues stay well separated.
  - The hybrid golden uses a single molecule: the reference treats the
    collated batch as one point cloud (cross-molecule kNN + batch-global
    frame centroids), our design is per-molecule (documented deviation) —
    the two coincide exactly only at batch size 1.

Usage: python scripts/ref_capture/capture_faformer.py
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
from equihgnn.models.layers.fa_former_layer import (  # noqa: E402
    FAFormer,
    FAFormerConfig,
)
from equihgnn.models import equihnn_fa_former as ref_mod  # noqa: E402

from equihgnn_tpu.data.synthetic import make_synthetic_dataset  # noqa: E402


def _anisotropic_coords(gen, n):
    c = torch.randn(1, n, 3, generator=gen)
    return c * torch.tensor([2.0, 1.2, 0.6])  # separated covariance spectrum


def capture_faformer_module():
    torch.manual_seed(53)
    d, n, k = 32, 24, 8
    cfg = FAFormerConfig(
        d_input=d, n_layers=2, n_neighbors=k, n_heads=2, d_model=d,
        d_edge_model=d, norm="layer", valid_radius=5.0, activation="swiglu",
        n_pos=None,
    )
    model = FAFormer(cfg)
    model.eval()
    gen = torch.Generator().manual_seed(59)
    feats = torch.randn(1, n, d, generator=gen)
    coors = _anisotropic_coords(gen, n)
    with torch.no_grad():
        tok, geo = model(feats, coors)
    save("faformer_module", {
        "in::feats": feats.numpy()[0], "in::coors": coors.numpy()[0],
        "out::token": tok.numpy()[0], "out::coords": geo.numpy()[0],
        "meta::k": np.array(k),
        **state_arrays(model),
    })


def capture_faformer_model():
    # Single molecule: the reference treats the collated batch as ONE point
    # cloud (batch_idx all zero), so its geo centroid blend (see module
    # docstring) targets the BATCH centroid; our per-molecule deviation
    # coincides with it exactly only for a 1-molecule batch.
    samples = [s for s in make_synthetic_dataset(8, seed=17) if s.n_atoms >= 16][:1]
    d = collate_reference_batch(samples)
    pos = np.concatenate([s.pos for s in samples]).astype(np.float32)
    data = RefData(d)
    data.pos = torch.from_numpy(pos)
    torch.manual_seed(61)
    model = ref_mod.FAFormerEquiHNNS(1, Args(normalization="ln"))
    model.eval()
    with torch.no_grad():
        out = model(data)
    save("model_faformer_equihnns", {
        **{f"in::{k}": v for k, v in d.items()},
        "in::pos": pos,
        "out::y": out.numpy(),
        **state_arrays(model),
    })


if __name__ == "__main__":
    torch.set_num_threads(4)
    print("capturing FAFormer module golden")
    capture_faformer_module()
    print("capturing FAFormerEquiHNNS model golden")
    capture_faformer_model()
