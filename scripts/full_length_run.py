"""Full-length reference-recipe training run (VERDICT round-1 item #7).

Runs the reference's ACTUAL lifecycle (`reference main.py:259-293`): up to 400
epochs at the run_qm9_3d.sh hyperparameters (hidden 256, 3 conv layers,
output hidden 128, Adam 1e-4, batch 768), ReduceLROnPlateau(factor 0.1,
patience 10), early-stop 50, orbax best/last checkpointing, and a final test
that RESTORES THE BEST checkpoint — on a QM9-scale (130k) synthetic dataset
with the learnable structure+geometry target from learning_check.py.

    nohup python scripts/full_length_run.py > logs/full_length_run.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))
sys.path.insert(0, _here)

import numpy as np

from learning_check import learnable_target  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--method", default="egnn_equihnns")
    ap.add_argument("--size", type=int, default=130_000)
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--batch_size", type=int, default=768)
    ap.add_argument("--compute_dtype", default=None)
    ap.add_argument("--log_dir", default="logs/full_length")
    args = ap.parse_args()

    from equihgnn_tpu import create_model
    from equihgnn_tpu.data.batching import spec_for_samples
    from equihgnn_tpu.data.packed import PackedSamples, iter_packed_batches
    from equihgnn_tpu.data.synthetic import make_synthetic_dataset
    from equihgnn_tpu.models.config import ModelConfig
    from equihgnn_tpu.train.trainer import TrainConfig, Trainer

    t0 = time.time()
    samples = make_synthetic_dataset(args.size, seed=0, num_targets=1)
    ys = np.array([learnable_target(s) for s in samples], dtype=np.float32)
    mean, std = ys.mean(), ys.std(ddof=1)
    for s, y in zip(samples, (ys - mean) / std):
        s.y = np.float32(y)
    print(f"dataset built in {time.time()-t0:.0f}s", flush=True)

    rng = np.random.default_rng(0)
    perm = rng.permutation(len(samples))
    n_tr, n_va = int(0.8 * len(samples)), int(0.1 * len(samples))
    idx = {"train": perm[:n_tr], "valid": perm[n_tr:n_tr + n_va],
           "test": perm[n_tr + n_va:]}
    packed = PackedSamples.from_samples(samples)
    spec = spec_for_samples(samples, batch_size=args.batch_size)

    def loader(split, shuffle=False, epoch=0):
        return iter_packed_batches(
            packed, spec, target=None, with_pos=True, shuffle=shuffle,
            rng=np.random.default_rng(7 + epoch), indices=idx[split],
            pack_slots=True,
        )

    # reference run_qm9_3d.sh recipe (`reference scripts/run_qm9_3d.sh:11-31`)
    model = create_model(
        args.method, num_target=1,
        cfg=ModelConfig(
            mlp_hidden=256, output_hidden=128, all_num_layers=3,
            output_num_layers=3, aggregate="mean",
            compute_dtype=args.compute_dtype,
        ),
    )
    tcfg = TrainConfig(
        epochs=args.epochs, lr=1e-4, weight_decay=0.0, seed=0,
        plateau_factor=0.1, plateau_patience=10, early_stop_patience=50,
        log_dir=args.log_dir,
    )
    trainer = Trainer(model, tcfg, next(iter(loader("train"))), std=float(std))
    best = trainer.fit(lambda e: loader("train", True, e),
                       lambda: loader("valid"))
    test = trainer.test(lambda: loader("test"), restore_best=True)

    yt = ys[idx["test"]]
    base_mae = float(np.mean(np.abs(yt - ys[idx["train"]].mean())))
    hist = [
        {"epoch": h["epoch"], "train_loss": round(h["train_loss"], 5),
         "val_mae": round(h["val_mae_mean"], 5), "lr": h.get("lr")}
        for h in trainer.history
    ]
    print("FULL_LENGTH_RUN " + json.dumps({
        "method": args.method,
        "size": args.size,
        "epochs_ran": len(trainer.history),
        "wall_s": round(time.time() - t0, 1),
        "best_val_mae_denorm": round(best["val_mae_mean"], 5),
        "test_mae_denorm_restored_best": round(test["test_mae_mean"], 5),
        "predict_mean_baseline_mae": round(base_mae, 5),
        "improvement_over_baseline": round(
            base_mae / max(test["test_mae_mean"], 1e-9), 2
        ),
        "history_every10": hist[::10],
        "final_epochs": hist[-3:],
    }), flush=True)


if __name__ == "__main__":
    main()
