"""Fit-path throughput: the REAL Trainer train loop (host loader + padding +
H2D + jitted step), not bench.py's pre-staged device batches.

    python scripts/bench_fit.py [method] [n_mols] [epochs]

Times `Trainer.train_epoch` directly (no eval / checkpoint contamination)
on synthetic QM9-like molecules at the reference recipe shapes (hidden 256,
batch 768), counting the actual batches each shuffled epoch produces (the
greedy capacity packer's batch count varies per epoch). The gap between
this number and bench.py's device step time is the host overhead the async
loop (PERF.md "Async training loop") is meant to remove: the pre-async
full-length run showed ~165 ms wall/step vs 21.8 ms device.

Axon discipline: one TPU client at a time; never kill mid-work.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("BENCH_FIT_BATCH", 768))
HIDDEN = int(os.environ.get("BENCH_FIT_HIDDEN", 256))


def main():
    method = sys.argv[1] if len(sys.argv) > 1 else "egnn_equihnns"
    n_mols = int(sys.argv[2]) if len(sys.argv) > 2 else 20 * BATCH
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    if os.environ.get("BENCH_FIT_PLATFORM"):
        # sitecustomize pre-selects the axon platform; the env var route is
        # ignored after that — only the config API switches backends
        import jax

        jax.config.update("jax_platforms", os.environ["BENCH_FIT_PLATFORM"])

    import jax
    import numpy as np

    from equihgnn_tpu import create_model
    from equihgnn_tpu.data.batching import spec_for_samples
    from equihgnn_tpu.data.packed import PackedSamples, iter_packed_batches
    from equihgnn_tpu.data.synthetic import make_synthetic_dataset
    from equihgnn_tpu.models.config import ModelConfig
    from equihgnn_tpu.train.trainer import TrainConfig, Trainer

    samples = make_synthetic_dataset(n_mols, seed=0, num_targets=1)
    for s in samples:
        s.y = np.float32((s.n_atoms - 16.0) / 8.0)
    spec = spec_for_samples(samples, batch_size=BATCH)
    packed = PackedSamples.from_samples(samples)

    steps = {"n": 0, "mols": 0}

    def loader(epoch, count=False):
        for b in iter_packed_batches(
            packed, spec, target=0, with_pos=True, pack_slots=True,
            shuffle=True, rng=np.random.default_rng(epoch),
        ):
            if count:
                steps["n"] += 1
                steps["mols"] += int(b.graph_mask.sum())
            yield b

    model = create_model(
        method, num_target=1,
        cfg=ModelConfig(
            mlp_hidden=HIDDEN, output_hidden=128, all_num_layers=3,
            output_num_layers=3, aggregate="mean", normalization="ln",
        ),
    )
    cfg = TrainConfig(epochs=1, lr=1e-4, seed=0, num_bootstraps=2)
    example = next(loader(0))
    trainer = Trainer(model, cfg, example, std=1.0)
    rng = jax.random.key(cfg.seed + 1, impl=cfg.rng_impl)

    # epoch 0 pays compile; epochs 1..N are the measurement
    t0 = time.perf_counter()
    trainer.train_epoch(loader(0), cfg.lr, rng)
    compile_epoch_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for e in range(1, epochs + 1):
        trainer.train_epoch(loader(e, count=True), cfg.lr, rng)
    dt = time.perf_counter() - t0

    wall_ms_per_step = 1e3 * dt / max(steps["n"], 1)
    out = {
        "metric": "fit_path_wall_ms_per_step",
        "method": method,
        "n_mols": n_mols,
        "steps_timed": steps["n"],
        "epochs_timed": epochs,
        "wall_ms_per_step": round(wall_ms_per_step, 2),
        "mols_per_sec_fit_path": round(steps["mols"] / dt, 1),
        "compile_epoch_s": round(compile_epoch_s, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
