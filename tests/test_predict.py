"""Serving path: checkpoint → equihgnn_tpu.predict → predictions CSV."""

from __future__ import annotations

import csv
import os

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
SDF = os.path.join(HERE, "..", "datasets", "real_sample", "sample.sdf")


def _train_tiny(tmp_path, method="egnn_equihnns"):
    import dataclasses

    from equihgnn_tpu import create_model
    from equihgnn_tpu.data.batching import (
        iter_batches,
        pad_hypergraph_batch,
        spec_for_samples,
    )
    from equihgnn_tpu.data.featurize import mol_to_hypergraph
    from equihgnn_tpu.data.sdf import read_sdf
    from equihgnn_tpu.models.config import ModelConfig
    from equihgnn_tpu.train.trainer import TrainConfig, Trainer

    samples = []
    for m in read_sdf(SDF):
        pos = m.GetConformer().GetPositions().astype(np.float32)
        z = np.asarray([a.GetAtomicNum() for a in m.GetAtoms()], np.int32)
        samples.append(
            mol_to_hypergraph(
                m, y=np.float32([(m.GetNumAtoms() - 6.0) / 3.0]), pos=pos, z=z
            )
        )
    spec = spec_for_samples(samples, batch_size=len(samples))
    cfg_m = ModelConfig(mlp_hidden=16, output_hidden=8)
    model = create_model(method, num_target=1, cfg=cfg_m)
    tcfg = TrainConfig(
        epochs=2, lr=1e-3, seed=0, num_bootstraps=2, log_dir=str(tmp_path),
        run_meta={
            "method": method,
            "model_config": dataclasses.asdict(cfg_m),
            "std": 3.0,
        },
    )
    tr = Trainer(
        model, tcfg, pad_hypergraph_batch(samples, spec, with_pos=True),
        std=3.0,
    )
    tr.fit(
        lambda e: iter_batches(samples, spec, with_pos=True),
        lambda: iter_batches(samples, spec, with_pos=True),
    )
    return os.path.join(str(tmp_path), "ckpt_best")


def test_predict_cli_roundtrip(tmp_path):
    """Train 2 epochs on the 20 real molecules, then predict on the same SDF
    through the CLI entry: meta-driven model rebuild, featurize, forward,
    de-normalization, row alignment."""
    from equihgnn_tpu.predict import build_parser, run

    ckpt = _train_tiny(tmp_path)
    assert os.path.exists(ckpt) and os.path.exists(ckpt + ".meta.json")

    out = str(tmp_path / "preds.csv")
    run(build_parser().parse_args(
        ["--ckpt", ckpt, "--sdf", SDF, "--out", out, "--batch_size", "8"]
    ))
    with open(out) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 20
    vals = np.array([float(r["prediction"]) for r in rows])
    assert np.isfinite(vals).all()
    # de-normalized by the stored std=3: benzene (11 heavy+H atoms) target
    # scale is O(1); predictions from a 2-epoch model are loose but bounded
    assert np.abs(vals).max() < 100.0
    assert rows[4]["title"] == "benzene"


def test_predict_missing_meta(tmp_path):
    from equihgnn_tpu.predict import load_checkpoint

    with pytest.raises(FileNotFoundError):
        load_checkpoint(str(tmp_path / "nope"))


def test_predict_from_smiles(tmp_path):
    """2-D trunk model served on a SMILES list (first-party parser)."""
    from equihgnn_tpu.predict import build_parser, run

    ckpt = _train_tiny(tmp_path / "m", method="mhnns")
    smi = tmp_path / "in.smi"
    smi.write_text("c1ccccc1\nCC(=O)O\nnot_a_molecule\nC=CC#N\n")
    out = str(tmp_path / "preds.csv")
    run(build_parser().parse_args(
        ["--ckpt", ckpt, "--smiles", str(smi), "--out", out]
    ))
    with open(out) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 4
    assert rows[2]["prediction"] == "nan"  # unparsable stays row-aligned
    assert np.isfinite(float(rows[0]["prediction"]))
