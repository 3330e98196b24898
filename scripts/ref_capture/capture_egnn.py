"""Capture PyTorch-reference goldens for the EGNN encoder path.

Runs the reference EGNN layer (`/root/reference/equihgnn/models/layers/
egnn_layer.py:143-366`) and the full EGNNEquiHNNS hybrid
(`equihnn_egnn.py:97-169`) under CPU torch and saves goldens.

Neighbor-selection note: torch `topk` and `jax.lax.top_k` may order equal
candidates differently, but EGNN's neighbor reductions (coordinate weighted
sum, message sum) are permutation-invariant and the radius mask is by value,
so outputs agree as long as the selected *sets* agree — guaranteed here by
random (tie-free) coordinates with k < n_atoms.

Usage: python scripts/ref_capture/capture_egnn.py
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
from equihgnn.models.layers.egnn_layer import EGNN  # noqa: E402
from equihgnn.models import equihnn_egnn as ref_mod  # noqa: E402

from equihgnn_tpu.data.synthetic import make_synthetic_dataset  # noqa: E402


def capture_egnn_layer():
    torch.manual_seed(31)
    d, n, k = 32, 20, 8
    layer = EGNN(dim=d, norm_coors=True, norm_feats=True,
                 valid_radius=5.0, num_nearest_neighbors=k)
    layer.eval()
    gen = torch.Generator().manual_seed(37)
    feats = torch.randn(1, n, d, generator=gen)
    # coords spread so some pairs exceed sqrt(5) (squared-radius quirk bites)
    coors = torch.randn(1, n, 3, generator=gen) * 1.5
    with torch.no_grad():
        fo, co = layer(feats, coors)
    save("egnn_layer", {
        "in::feats": feats.numpy()[0], "in::coors": coors.numpy()[0],
        "out::feats": fo.numpy()[0], "out::coors": co.numpy()[0],
        "meta::k": np.array(k),
        **state_arrays(layer),
    })


def capture_egnn_model():
    samples = make_synthetic_dataset(6, seed=17)
    d = collate_reference_batch(samples)
    pos = np.concatenate([s.pos for s in samples]).astype(np.float32)
    data = RefData(d)
    data.pos = torch.from_numpy(pos)
    torch.manual_seed(41)
    model = ref_mod.EGNNEquiHNNS(1, Args(normalization="ln"))
    model.eval()
    with torch.no_grad():
        out = model(data)
    save("model_egnn_equihnns", {
        **{f"in::{k}": v for k, v in d.items()},
        "in::pos": pos,
        "out::y": out.numpy(),
        **state_arrays(model),
    })


if __name__ == "__main__":
    torch.set_num_threads(4)
    print("capturing EGNN layer golden")
    capture_egnn_layer()
    print("capturing EGNNEquiHNNS model golden")
    capture_egnn_model()
