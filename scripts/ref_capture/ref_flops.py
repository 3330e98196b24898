"""Count the REFERENCE implementation's matmul FLOPs per training step.

Runs the ACTUAL reference models (from /root/reference, under the CPU-torch
shims) at the benchmark hyperparameters (hidden 256, 3 conv layers,
output_hidden 128 — `reference scripts/run_qm9_3d.sh:11-31`) and counts
forward+backward FLOPs with `torch.utils.flop_counter.FlopCounterMode`.

Why this exists (VERDICT round-3 missing #1): the driver line's A100 anchor
was computed from OUR OWN per-step FLOPs — crediting a hypothetical A100
implementation with the same radial-kernel factorization we derived
(DECISIONS.md #19, ~15x fewer FLOPs than the reference's per-edge
R(dist)=W*h+b materialization, `reference equiformer_layer.py:451-479`,
`se3_transformer_layer.py:311-336`). This script measures what the REFERENCE
implementation actually computes, from its own torch graph, so
`a100_ref_impl_est_*` can anchor against the implementation a user would
really run on an A100.

Accounting notes (all choices undercount the reference, i.e. favor the A100):
- FlopCounterMode counts only matmul/bmm/conv/sdpa FLOPs. The reference's
  eager scatters, its dense O(N^2) batch-as-point-cloud pairwise distance
  tensors (`egnn_layer.py:253-256`, `equiformer_layer.py:1271-1279`), topk
  neighbor selection, and all elementwise work count ZERO here.
- Heavy methods are counted at a small batch and scaled per-ATOM to the
  bench batch (768). All counted FLOPs live on [N_atoms, k=16] kNN edges or
  on node/incidence rows, all linear in atoms; the quadratic-in-atoms parts
  are the uncounted elementwise/memory ops above. (They are also why the
  reference literally cannot hold batch 768 on a 80 GB A100 for
  equiformer/SE3 - the per-edge R tensors alone are 58-108 GB, PERF.md -
  the anchor charitably assumes it runs anyway.)
- Dropout is 0 in the bench recipe; eval-mode differences don't apply
  (model.train(), full fwd+bwd+Adam step like the bench).

Writes REFERENCE_FLOPS.json:
  {method: {flops_per_step_b768, flops_per_mol, counted_batch, ...}}

Usage: python scripts/ref_capture/ref_flops.py [--method M] (default: all)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.dirname(__file__))

import shims  # noqa: E402

shims.install()

import jdense  # noqa: E402

jdense.install()

import torch  # noqa: E402
from torch.utils.flop_counter import FlopCounterMode  # noqa: E402

from capture_core import Args, RefData, collate_reference_batch  # noqa: E402
from equihgnn_tpu.data.synthetic import make_synthetic_dataset  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "..", "REFERENCE_FLOPS.json")

BENCH_BATCH = 768
# Count batches sized so the reference's per-edge R tensors + autograd
# residuals fit host RAM (equiformer/SE3 materialize nc_out*nc_in per edge).
COUNT_BATCH = {
    "mhnns": 768,
    "egnn_equihnns": 96,
    "equiformer_equihnns": 24,
    "se3_transformer_equihnns": 24,
    "visnet_equihnns": 96,
    "faformer_equihnns": 48,
}


def build_model(method: str):
    args = Args(MLP_hidden=256, output_hidden=128, All_num_layers=3,
                normalization="ln")
    if method == "mhnns":
        from equihgnn.models.mhnn import MHNNS

        return MHNNS(1, args)
    if method == "egnn_equihnns":
        from equihgnn.models.equihnn_egnn import EGNNEquiHNNS

        return EGNNEquiHNNS(1, args)
    if method == "equiformer_equihnns":
        from equihgnn.models.equihnn_equiformer import EquiformerEquiHNNS

        return EquiformerEquiHNNS(1, args)
    if method == "se3_transformer_equihnns":
        from equihgnn.models.equihnn_se3_transformer import (
            SE3TransformerEquiHNNS,
        )

        return SE3TransformerEquiHNNS(1, args)
    if method == "visnet_equihnns":
        from equihgnn.models.equihnn_visnet import VisNetEquiHNNS

        return VisNetEquiHNNS(1, args)
    if method == "faformer_equihnns":
        from equihgnn.models.equihnn_fa_former import FAFormerEquiHNNS

        return FAFormerEquiHNNS(1, args)
    raise ValueError(method)


def make_batch(samples):
    d = collate_reference_batch(samples)
    data = RefData(d)
    data.pos = torch.from_numpy(
        np.concatenate([np.asarray(s.pos, np.float32) for s in samples])
    )
    data.y = torch.randn(len(samples))
    return data


def count_method(method: str) -> dict:
    torch.manual_seed(0)
    nb = COUNT_BATCH[method]
    # same synthetic distribution as the TPU bench / CPU reference bench
    samples_768 = make_synthetic_dataset(BENCH_BATCH, seed=5)
    atoms_768 = int(sum(s.n_atoms for s in samples_768))
    samples = samples_768[:nb]
    atoms_nb = int(sum(s.n_atoms for s in samples))
    data = make_batch(samples)

    model = build_model(method)
    model.train()
    loss_fn = torch.nn.MSELoss()
    with FlopCounterMode(display=False) as fc:
        out = model(data)
        loss = loss_fn(out, data.y)
        loss.backward()
    counted = int(fc.get_total_flops())
    scale = atoms_768 / atoms_nb
    flops_768 = counted * scale
    return {
        "method": method,
        "counted_batch": nb,
        "counted_atoms": atoms_nb,
        "counted_flops_fwd_bwd": counted,
        "atoms_b768": atoms_768,
        "flops_per_step_b768": flops_768,
        "tflops_per_step_b768": round(flops_768 / 1e12, 4),
        "flops_per_mol": round(flops_768 / BENCH_BATCH),
        "note": "matmul-only FLOPs of the ACTUAL reference torch graph "
                "(fwd+bwd, train mode, bench hyperparameters), scaled "
                "per-atom to batch 768; scatters/elementwise/O(N^2) "
                "pairwise tensors count zero (undercounts the reference)",
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--method", default="all")
    a = ap.parse_args()
    torch.set_num_threads(1)

    methods = (
        list(COUNT_BATCH) if a.method == "all" else [a.method]
    )
    existing = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            existing = json.load(f)
    for m in methods:
        print(f"[ref_flops] counting {m} at batch {COUNT_BATCH[m]} ...",
              flush=True)
        r = count_method(m)
        existing[m] = r
        print(json.dumps(r))
        with open(OUT, "w") as f:
            json.dump(existing, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
