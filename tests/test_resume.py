"""Checkpoint/resume: training continues from the saved epoch and LR."""

import numpy as np

from equihgnn_tpu import create_model
from equihgnn_tpu.data.batching import iter_batches, pad_hypergraph_batch, spec_for_samples
from equihgnn_tpu.data.synthetic import make_synthetic_dataset
from equihgnn_tpu.models.config import ModelConfig
from equihgnn_tpu.train.trainer import TrainConfig, Trainer


def test_resume_from_last(tmp_path):
    samples = make_synthetic_dataset(64, seed=0, with_pos=False)
    for s in samples:
        s.y = np.float32((s.n_atoms - 16.0) / 8.0)
    spec = spec_for_samples(samples, batch_size=16)
    train, val = samples[:48], samples[48:]
    loaders = (
        lambda e: iter_batches(train, spec, shuffle=True,
                               rng=np.random.default_rng(e)),
        lambda: iter_batches(val, spec),
    )

    def make_trainer(resume):
        model = create_model(
            "mhnns", num_target=1, cfg=ModelConfig(mlp_hidden=16, output_hidden=8)
        )
        cfg = TrainConfig(epochs=4, lr=1e-3, seed=0, log_dir=str(tmp_path),
                          resume=resume)
        example = pad_hypergraph_batch(train[:16], spec)
        return Trainer(model, cfg, example, std=1.0)

    t1 = make_trainer(False)
    t1.fit(*loaders)
    assert len(t1.history) == 4

    # fresh trainer resumes at epoch 4 → immediately done (epochs=4)
    t2 = make_trainer(True)
    t2.fit(*loaders)
    assert len(t2.history) == 0

    # raising the budget continues from epoch 4
    t3 = make_trainer(True)
    t3.cfg.epochs = 6
    t3.fit(*loaders)
    assert [h["epoch"] for h in t3.history] == [4, 5]
    # resumed params start from trained state: val mae should not regress much
    assert t3.history[0]["val_mae_raw"] < t1.history[0]["val_mae_raw"]
