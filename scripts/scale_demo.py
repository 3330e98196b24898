"""Scale demonstration (SURVEY Phase 5): train a geometric-encoder hybrid on
500k molecules through the object-free streaming path with flat RSS.

Mirrors the reference's PCQM4Mv2 scale story (~3.7M molecules via PyG
InMemoryDataset, `reference equihgnn/data/pcqm4.py:57-114`) on synthetic
data (no RDKit/network in this image). Run:

    python scripts/scale_demo.py [--method faformer_equihnns] [--size 500000]

Prints bucket/padding-waste stats (from the CLI), a sampled RSS curve, and
throughput. RSS is sampled on a daemon thread every 5 s.
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def current_rss_mb() -> float:
    with open("/proc/self/statm") as f:
        pages = int(f.read().split()[1])
    return pages * 4096 / 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--method", default="faformer_equihnns")
    ap.add_argument("--size", type=int, default=500_000)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--batch_size", type=int, default=768)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--max_atoms", type=int, default=29)
    args = ap.parse_args()

    samples = []
    stop = threading.Event()

    def sampler():
        while not stop.is_set():
            samples.append((round(time.time() - t0, 1), round(current_rss_mb(), 1)))
            stop.wait(5.0)

    t0 = time.time()
    threading.Thread(target=sampler, daemon=True).start()

    from equihgnn_tpu.main import build_parser, run

    cli = [
        "--streaming", "--data", "synthetic_hg_3d",
        "--synthetic_size", str(args.size),
        "--method", args.method,
        "--epochs", str(args.epochs),
        "--batch_size", str(args.batch_size),
        "--buckets", "16",
        "--target", "0",
        "--All_num_layers", "3", "--MLP_hidden", str(args.hidden),
        "--output_hidden", "128", "--output_num_layers", "3",
        "--aggregate", "mean", "--lr", "0.0001",
        "--synthetic_max_atoms", str(args.max_atoms),
    ]
    if args.platform:
        cli += ["--platform", args.platform]
    result = run(build_parser().parse_args(cli))
    stop.set()

    n_train = int(0.8 * args.size)
    wall = time.time() - t0
    # flatness: compare RSS after data generation (first quartile of samples
    # past the 25% mark) to the end
    tail = [r for _, r in samples[len(samples) // 2 :]]
    report = {
        "method": args.method,
        "molecules": args.size,
        "max_atoms": args.max_atoms,
        "epochs": args.epochs,
        "wall_s": round(wall, 1),
        "test_mae_raw": result.get("test_mae_raw"),
        "rss_curve_mb": samples[:: max(1, len(samples) // 40)],
        "rss_peak_mb": round(rss_mb(), 1),
        "rss_tail_drift_mb": round(max(tail) - min(tail), 1) if tail else None,
    }
    print("SCALE_DEMO " + json.dumps(report))


if __name__ == "__main__":
    main()
