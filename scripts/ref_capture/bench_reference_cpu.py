"""Measure the PyTorch reference's training-step throughput on CPU.

Runs the ACTUAL reference model (default: the flagship `egnn_equihnns`
hybrid, benchmark recipe hidden=256 / 3 conv layers / output_hidden=128 /
batch 768 — `reference scripts/run_qm9_3d.sh:11-31`) under CPU torch with
the shims, full forward + backward + Adam step, on the same synthetic
molecule distribution the TPU bench uses.

This provides the external LOWER anchor for BENCH vs_reference numbers
(`bench.py` reads the JSON this writes). The A100 number in PERF.md is an
analytic estimate (see PERF.md "External anchors"): no GPU exists in this
environment.

Usage: python scripts/ref_capture/bench_reference_cpu.py [--method M]
       [--batch-size 768] [--steps 3] [--hidden 256]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.dirname(__file__))

import shims  # noqa: E402

shims.install()

import torch  # noqa: E402

from capture_core import Args, RefData, collate_reference_batch  # noqa: E402
from equihgnn_tpu.data.synthetic import make_synthetic_dataset  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "..", "REFERENCE_CPU_BENCH.json")


def build_model(method: str, hidden: int, output_hidden: int):
    args = Args(
        MLP_hidden=hidden, output_hidden=output_hidden,
        All_num_layers=3, normalization="ln",
    )
    if method == "mhnns":
        from equihgnn.models.mhnn import MHNNS

        return MHNNS(1, args)
    if method == "mhnn":
        from equihgnn.models.mhnn import MHNN

        return MHNN(1, args)
    if method == "egnn_equihnns":
        from equihgnn.models.equihnn_egnn import EGNNEquiHNNS

        return EGNNEquiHNNS(1, args)
    if method == "faformer_equihnns":
        from equihgnn.models.equihnn_fa_former import FAFormerEquiHNNS

        return FAFormerEquiHNNS(1, args)
    if method == "visnet_equihnns":
        from equihgnn.models.equihnn_visnet import VisNetEquiHNNS

        return VisNetEquiHNNS(1, args)
    if method in ("gin", "gcn"):
        from equihgnn.models.baseline_2d import GNN_2D

        return GNN_2D(1, gnn_type=method, drop_ratio=0.0)
    raise ValueError(method)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--method", default="egnn_equihnns")
    ap.add_argument("--batch-size", type=int, default=768)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--output-hidden", type=int, default=128)
    ap.add_argument("--threads", type=int, default=0)
    a = ap.parse_args()

    if a.threads:
        torch.set_num_threads(a.threads)
    torch.manual_seed(0)

    if a.method in ("gin", "gcn"):
        from capture_baseline2d import GraphData

        samples = make_synthetic_dataset(a.batch_size, seed=5, hyper=False)
        data = GraphData(samples)
    else:
        samples = make_synthetic_dataset(a.batch_size, seed=5)
        d = collate_reference_batch(samples)
        data = RefData(d)
        if a.method != "mhnns" and a.method != "mhnn":
            pos = np.concatenate([s.pos for s in samples]).astype(np.float32)
            data.pos = torch.from_numpy(pos)
    data.y = torch.randn(a.batch_size)

    model = build_model(a.method, a.hidden, a.output_hidden)
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)
    loss_fn = torch.nn.MSELoss()

    def step():
        opt.zero_grad()
        out = model(data)
        loss = loss_fn(out, data.y)
        loss.backward()
        opt.step()
        return float(loss)

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(a.steps):
        step()
    dt = (time.perf_counter() - t0) / a.steps

    result = {
        "method": a.method,
        "batch_size": a.batch_size,
        "hidden": a.hidden,
        "sec_per_step": dt,
        "mols_per_sec": a.batch_size / dt,
        "torch_threads": torch.get_num_threads(),
        "device": "cpu",
        "note": "reference model from /root/reference run under CPU torch "
                "with scripts/ref_capture/shims.py; synthetic QM9-like "
                "molecules identical in distribution to the TPU bench",
    }
    print(json.dumps(result))
    existing = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            existing = json.load(f)
    existing[a.method] = result
    with open(OUT, "w") as f:
        json.dump(existing, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
