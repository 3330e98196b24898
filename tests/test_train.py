"""Training harness: schedulers, metrics, end-to-end fit on synthetic data."""

import os

import numpy as np
import pytest

from equihgnn_tpu.train.metrics import EvalAccumulator, bootstrap_metrics
from equihgnn_tpu.train.schedule import EarlyStopping, ReduceLROnPlateau


def test_plateau_matches_torch_semantics():
    s = ReduceLROnPlateau(1.0, factor=0.1, patience=2, min_lr=1e-3)
    # improving: no decay
    assert s.step(10.0) == 1.0
    assert s.step(9.0) == 1.0
    # stall: decay after patience+1 bad epochs
    assert s.step(9.0) == 1.0   # bad 1
    assert s.step(9.0) == 1.0   # bad 2
    assert s.step(9.0) == pytest.approx(0.1)  # bad 3 > patience → decay
    # floor
    for _ in range(10):
        lr = s.step(9.0)
    assert lr == pytest.approx(1e-3)


def test_early_stopping():
    es = EarlyStopping(patience=3)
    for m in [5.0, 4.0, 4.1, 4.2]:
        assert not es.step(m)
    assert es.step(4.3)  # 3rd bad epoch


def test_bootstrap_metrics_sane(rng):
    preds = rng.standard_normal(1000)
    targets = preds + 0.1 * rng.standard_normal(1000)
    m = bootstrap_metrics(preds, targets, num_bootstraps=50, seed=0)
    assert abs(m["mae_mean"] - m["mae_raw"]) < 0.01
    assert m["mae_std"] > 0
    assert m["mse_mean"] == pytest.approx(0.01, rel=0.3)


def test_eval_accumulator_denormalizes(rng):
    acc = EvalAccumulator(std=2.0)
    preds = np.array([1.0, 2.0, 3.0])
    targets = np.array([1.5, 2.0, 2.5])
    mask = np.array([True, True, False])
    acc.update(preds, targets, mask)
    p, t = acc.arrays()
    np.testing.assert_allclose(p, [2.0, 4.0])
    np.testing.assert_allclose(t, [3.0, 4.0])


def test_fit_reduces_loss_and_checkpoints(tmp_path):
    """End-to-end: learnable target (sum of atom-count signal), few epochs."""
    import jax
    from equihgnn_tpu import create_model
    from equihgnn_tpu.data.batching import pad_hypergraph_batch, spec_for_samples, iter_batches
    from equihgnn_tpu.data.synthetic import make_synthetic_dataset
    from equihgnn_tpu.models.config import ModelConfig
    from equihgnn_tpu.train.trainer import TrainConfig, Trainer

    samples = make_synthetic_dataset(128, seed=0, with_pos=False)
    for s in samples:  # learnable target: normalized atom count
        s.y = np.float32((s.n_atoms - 16.0) / 8.0)
    spec = spec_for_samples(samples, batch_size=32)
    train, val = samples[:96], samples[96:]

    model = create_model(
        "mhnns", num_target=1, cfg=ModelConfig(mlp_hidden=32, output_hidden=16)
    )
    cfg = TrainConfig(epochs=8, lr=3e-3, seed=0, log_dir=str(tmp_path))
    example = pad_hypergraph_batch(train[:32], spec)
    tr = Trainer(model, cfg, example, std=1.0)
    best = tr.fit(
        lambda e: iter_batches(train, spec, shuffle=True,
                               rng=np.random.default_rng(e)),
        lambda: iter_batches(val, spec),
    )
    hist = tr.history
    assert hist[-1]["train_loss"] < hist[0]["train_loss"] * 0.8
    assert best["val_mae_mean"] < np.inf
    assert os.path.exists(os.path.join(str(tmp_path), "metrics.csv"))
    assert os.path.exists(os.path.join(str(tmp_path), "ckpt_best"))

    m = tr.test(lambda: iter_batches(val, spec))
    assert np.isfinite(m["test_mae_mean"])
    assert os.path.exists(os.path.join(str(tmp_path), "test_results.csv"))


def test_prefetcher_basics():
    """Background prefetcher: order preserved, exceptions propagate, close()
    unblocks a producer stuck on a full queue."""
    import time as _time

    from equihgnn_tpu.train.trainer import _Prefetcher

    # order + completion
    assert list(_Prefetcher(iter(range(7)), depth=2)) == list(range(7))

    # exception propagation mid-stream
    def boom():
        yield 1
        raise RuntimeError("loader failed")

    pf = _Prefetcher(boom(), depth=2)
    assert next(pf) == 1
    with pytest.raises(RuntimeError, match="loader failed"):
        next(pf)

    # close() while the producer is blocked on a full queue
    pf = _Prefetcher(iter(range(100)), depth=1)
    assert next(pf) == 0
    pf.close()
    _time.sleep(0.3)
    assert not pf._thread.is_alive()


def test_fit_reproducible_same_seed(tmp_path):
    """The carried-key dropout stream is deterministic: two fits with the
    same seed produce identical loss trajectories (dropout active)."""
    from equihgnn_tpu import create_model
    from equihgnn_tpu.data.batching import (
        iter_batches,
        pad_hypergraph_batch,
        spec_for_samples,
    )
    from equihgnn_tpu.data.synthetic import make_synthetic_dataset
    from equihgnn_tpu.models.config import ModelConfig
    from equihgnn_tpu.train.trainer import TrainConfig, Trainer

    samples = make_synthetic_dataset(64, seed=0, with_pos=False)
    for s in samples:
        s.y = np.float32((s.n_atoms - 16.0) / 8.0)
    spec = spec_for_samples(samples, batch_size=32)

    def run():
        model = create_model(
            "mhnns", num_target=1,
            cfg=ModelConfig(mlp_hidden=16, output_hidden=8, dropout=0.3),
        )
        cfg = TrainConfig(epochs=3, lr=3e-3, seed=7, num_bootstraps=2,
                          log_dir=str(tmp_path))  # keep ckpts out of the cwd
        tr = Trainer(model, cfg, pad_hypergraph_batch(samples[:32], spec),
                     std=1.0)
        tr.fit(
            lambda e: iter_batches(samples, spec, shuffle=True,
                                   rng=np.random.default_rng(e)),
            lambda: iter_batches(samples[32:], spec),
        )
        return [h["train_loss"] for h in tr.history]

    a, b = run(), run()
    np.testing.assert_allclose(a, b, rtol=0, atol=0)
    assert a[-1] < a[0]  # and it actually learns with dropout on
