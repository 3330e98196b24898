"""End-to-end learning-quality validation on a LEARNABLE synthetic target.

Round-1 used i.i.d.-noise targets, so val MAE could not improve — this run
regresses a deterministic structure+geometry function:

    y = mean nearest-spatial-neighbor distance + conjugated-atom fraction

(the first is exactly what the kNN geometric encoders perceive; the second is
pure hypergraph structure; synthetic geometry is uncorrelated with topology,
so bond-length-style targets would be invisible to invariant per-atom
features). A model that actually learns must beat the predict-the-mean
baseline by a wide margin on held-out molecules.

    python scripts/learning_check.py [--method egnn_equihnns] [--epochs 30]
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def learnable_target(s) -> float:
    order = np.bincount(s.hedge_idx, minlength=s.n_hedges)
    y = 0.0
    # mean nearest-spatial-neighbor distance (what kNN encoders perceive)
    if s.pos is not None and s.n_atoms > 1:
        pos = np.asarray(s.pos)
        d2 = np.sum((pos[:, None] - pos[None, :]) ** 2, -1)
        np.fill_diagonal(d2, np.inf)
        y += float(np.mean(np.sqrt(d2.min(axis=1))))
    conj_atoms = set()
    off = 0
    for h in range(s.n_hedges):
        if order[h] > 2:
            conj_atoms.update(s.vertex_idx[off : off + order[h]].tolist())
        off += order[h]
    y += len(conj_atoms) / max(s.n_atoms, 1)
    return float(y)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--method", default="egnn_equihnns")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--size", type=int, default=20000)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from equihgnn_tpu import create_model
    from equihgnn_tpu.data.batching import spec_for_samples
    from equihgnn_tpu.data.packed import PackedSamples, iter_packed_batches
    from equihgnn_tpu.data.synthetic import make_synthetic_dataset
    from equihgnn_tpu.models.config import ModelConfig
    from equihgnn_tpu.train.trainer import TrainConfig, Trainer

    samples = make_synthetic_dataset(args.size, seed=0, num_targets=1)
    ys = np.array([learnable_target(s) for s in samples], dtype=np.float32)
    mean, std = ys.mean(), ys.std(ddof=1)
    for s, y in zip(samples, (ys - mean) / std):
        s.y = np.float32(y)

    rng = np.random.default_rng(0)
    perm = rng.permutation(len(samples))
    n_tr, n_va = int(0.8 * len(samples)), int(0.1 * len(samples))
    idx = {"train": perm[:n_tr], "valid": perm[n_tr:n_tr + n_va],
           "test": perm[n_tr + n_va:]}
    packed = PackedSamples.from_samples(samples)
    spec = spec_for_samples(samples, batch_size=512)

    def loader(split, shuffle=False, epoch=0):
        return iter_packed_batches(
            packed, spec, target=None, with_pos=True, shuffle=shuffle,
            rng=np.random.default_rng(7 + epoch), indices=idx[split],
            pack_slots=True,
        )

    model = create_model(
        args.method, num_target=1,
        cfg=ModelConfig(mlp_hidden=128, output_hidden=64, output_num_layers=2),
    )
    tcfg = TrainConfig(epochs=args.epochs, lr=3e-4, seed=0,
                       early_stop_patience=50, log_dir=None)
    trainer = Trainer(model, tcfg, next(iter(loader("train"))), std=float(std))
    best = trainer.fit(lambda e: loader("train", True, e),
                       lambda: loader("valid"))
    test = trainer.test(lambda: loader("test"), restore_best=False)

    # baseline: predict the training mean → normalized MAE of a N(0,1)-ish
    # target; computed exactly on the test split
    yt = ys[idx["test"]]
    base_mae = float(np.mean(np.abs(yt - ys[idx["train"]].mean())))
    hist = [
        {"epoch": h["epoch"], "train_loss": round(h["train_loss"], 4),
         "val_mae": round(h["val_mae_mean"], 4)}
        for h in trainer.history
    ]
    print("LEARNING_CHECK " + json.dumps({
        "method": args.method,
        "epochs_ran": len(trainer.history),
        "best_val_mae_denorm": round(best["val_mae_mean"], 4),
        "test_mae_denorm": round(test["test_mae_mean"], 4),
        "predict_mean_baseline_mae": round(base_mae, 4),
        "improvement_over_baseline": round(
            base_mae / max(test["test_mae_mean"], 1e-9), 2
        ),
        "history_every5": hist[::5],
    }))


if __name__ == "__main__":
    main()
