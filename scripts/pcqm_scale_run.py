"""PCQM4Mv2-scale demonstration: 3.7M molecules, faformer, one real epoch.

The reference's config 5 trains `faformer_equihnns` on PCQM4Mv2-3D
(~3.7M molecules, `reference equihgnn/data/pcqm4.py:57-114`,
`scripts/run_pcqm_3d.sh`). No network/RDKit in this image, so the molecules
are synthetic with the same size range; everything else is the real
production path: packed mmap cache on disk → 80/10/10 split as index
arrays → bucketed static specs → native C++ packer streaming → async
Trainer on the real chip → val/test eval.

Two phases, so the ~1 h generation is paid once and the measured epoch is
clean of host contention:

    python scripts/pcqm_scale_run.py --phase gen    # build the mmap cache
    python scripts/pcqm_scale_run.py --phase train  # 1 epoch + eval on TPU

Appends a PCQM_SCALE json line (wall per phase, mols/s, RSS curve) to
stdout; SCALE.md records the result.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "datasets", "pcqm_scale_cache",
)


def current_rss_mb() -> float:
    with open("/proc/self/statm") as f:
        pages = int(f.read().split()[1])
    return pages * 4096 / 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["gen", "train"], required=True)
    ap.add_argument("--size", type=int, default=3_700_000)
    ap.add_argument("--method", default="faformer_equihnns")
    ap.add_argument("--batch_size", type=int, default=768)
    ap.add_argument("--compute_dtype", default="bfloat16")
    a = ap.parse_args()

    t0 = time.time()
    if a.phase == "gen":
        from equihgnn_tpu.data.packed import packed_from_dir, save_packed_dir
        from equihgnn_tpu.data.synthetic import make_synthetic_packed

        if os.path.exists(os.path.join(CACHE, "af_off.npy")):
            p = packed_from_dir(CACHE)
            if p.n == a.size:
                print(f"cache already present: {p.n} molecules at {CACHE}")
                return
        packed = make_synthetic_packed(a.size, seed=0, num_targets=16)
        save_packed_dir(packed, CACHE)
        print(json.dumps({
            "phase": "gen", "molecules": a.size,
            "wall_s": round(time.time() - t0, 1),
            "cache_gb": round(sum(
                os.path.getsize(os.path.join(CACHE, f))
                for f in os.listdir(CACHE)
            ) / 1e9, 2),
        }))
        return

    # train phase: stream from the mmap cache through the real CLI path
    rss = []
    stop = threading.Event()

    def sampler():
        while not stop.is_set():
            rss.append((round(time.time() - t0, 1), round(current_rss_mb(), 1)))
            stop.wait(10.0)

    threading.Thread(target=sampler, daemon=True).start()
    os.environ["EQUIHGNN_SYNTH_CACHE"] = CACHE

    from equihgnn_tpu.main import build_parser, run

    cli = [
        "--streaming", "--data", "synthetic_hg_3d",
        "--synthetic_size", str(a.size),
        "--method", a.method,
        "--epochs", "1",
        "--batch_size", str(a.batch_size),
        "--buckets", "16",
        "--target", "0",
        "--All_num_layers", "3", "--MLP_hidden", "256",
        "--output_hidden", "128", "--output_num_layers", "3",
        "--aggregate", "mean", "--lr", "0.0001",
    ]
    if a.compute_dtype:
        cli += ["--compute_dtype", a.compute_dtype]
    result = run(build_parser().parse_args(cli))
    stop.set()
    wall = time.time() - t0
    n_train = int(0.8 * a.size)
    tail = [r for _, r in rss[len(rss) // 2:]]
    print("PCQM_SCALE " + json.dumps({
        "phase": "train", "method": a.method, "molecules": a.size,
        "epochs": 1, "wall_s": round(wall, 1),
        "train_mols_per_sec_incl_eval": round(n_train / wall, 1),
        "test_mae_raw": result.get("test_mae_raw"),
        "rss_peak_mb": max(r for _, r in rss) if rss else None,
        "rss_tail_drift_mb": round(max(tail) - min(tail), 1) if tail else None,
        "rss_curve_mb": rss[:: max(1, len(rss) // 40)],
    }))


if __name__ == "__main__":
    main()
