"""Batch inference / serving entry: checkpoint → predictions CSV.

The reference has no inference path beyond `trainer.test` (predictions CSV
of the held-out split, `reference main.py:90-135`); serving a trained model
on NEW molecules is left to the user. This CLI closes that gap TPU-side:

    python -m equihgnn_tpu.predict --ckpt logs/<exp>/version_0/ckpt_best \
        --sdf molecules.sdf --out preds.csv

The checkpoint's `.meta.json` (written by the Trainer, `TrainConfig.run_meta`)
carries the method name, the full ModelConfig, and the target std, so the
model is rebuilt from the checkpoint alone — no flags to repeat. Input
molecules are featurized with the same first-party SDF reader + perception
the dataset layer uses (`data/sdf.py`, `data/featurize.py`); records that
fail to parse produce a `nan` prediction row, keeping the output aligned
with the input file. Predictions are de-normalized by the training std.
"""

from __future__ import annotations

import argparse
import csv
import json
import os

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True,
                   help="checkpoint dir (e.g. .../ckpt_best); expects "
                        "<ckpt>.meta.json next to it")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--sdf", help="input molecules (.sdf, 3-D capable)")
    src.add_argument("--smiles", help="input molecules (text file, one "
                     "SMILES per line; 2-D trunk methods only)")
    p.add_argument("--out", default="predictions.csv")
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--platform", default=None,
                   choices=["cpu", "tpu", "axon"])
    return p


def load_checkpoint(ckpt: str):
    """(meta dict, raw state pytree) from a Trainer checkpoint."""
    import orbax.checkpoint as ocp

    meta_path = ckpt + ".meta.json"
    if not os.path.exists(meta_path):
        raise FileNotFoundError(
            f"{meta_path} not found — the checkpoint was written without "
            "run_meta (pre-predict-CLI trainer); re-train or add the json."
        )
    with open(meta_path) as f:
        meta = json.load(f)
    for key in ("method", "model_config"):
        if key not in meta:
            raise KeyError(f"{meta_path} lacks '{key}'")
    state = ocp.StandardCheckpointer().restore(os.path.abspath(ckpt))
    return meta, state


def featurize_sdf(path: str, hyper: bool, with_pos: bool):
    """[(title, sample | None)] via the first-party reader + perception."""
    from equihgnn_tpu.data.featurize import mol_to_graph, mol_to_hypergraph
    from equihgnn_tpu.data.sdf import read_sdf, read_titles

    mols = read_sdf(path)
    titles = read_titles(path)
    out = []
    y0 = np.zeros(1, np.float32)
    for title, mol in zip(titles, mols):
        if mol is None:
            out.append((title, None))
            continue
        try:
            pos = z = None
            if with_pos:
                pos = np.asarray(
                    mol.GetConformer().GetPositions(), dtype=np.float32
                )
                z = np.asarray(
                    [a.GetAtomicNum() for a in mol.GetAtoms()], dtype=np.int32
                )
            fn = mol_to_hypergraph if hyper else mol_to_graph
            out.append((title, fn(mol, y=y0, pos=pos, z=z)))
        except Exception as e:  # malformed record → nan row, as datasets do
            print(f"skip {title!r}: {e}")
            out.append((title, None))
    return out


def featurize_smiles_file(path: str, hyper: bool):
    """[(smiles, sample | None)] via RDKit or the first-party parser."""
    from equihgnn_tpu.data.featurize import (
        mol_from_smiles,
        mol_to_graph,
        smiles_to_hypergraph,
    )

    y0 = np.zeros(1, np.float32)
    out = []
    with open(path) as f:
        for line in f:
            smi = line.strip()
            if not smi:
                continue
            if hyper:
                out.append((smi, smiles_to_hypergraph(smi, y=y0)))
            else:
                mol = mol_from_smiles(smi)
                out.append(
                    (smi, mol_to_graph(mol, y=y0) if mol is not None else None)
                )
    return out


def run(args) -> str:
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    from equihgnn_tpu.main import GRAPH_METHODS, _enable_compile_cache

    _enable_compile_cache()

    import jax

    import equihgnn_tpu.models  # noqa: F401 - registers model classes
    from equihgnn_tpu import create_model
    from equihgnn_tpu.data.batching import iter_batches, spec_for_samples
    from equihgnn_tpu.models.config import ModelConfig

    meta, state = load_checkpoint(args.ckpt)
    method = meta["method"]
    cfg = ModelConfig(**meta["model_config"])
    std = float(meta.get("std", 1.0))
    hyper = method not in GRAPH_METHODS
    # geometric encoders need coordinates; trunk-only methods do not
    with_pos = method.startswith(
        ("egnn", "visnet", "equiformer", "se3", "faformer")
    )

    if args.smiles:
        if with_pos:
            raise ValueError(
                f"method {method!r} needs 3-D coordinates — use --sdf"
            )
        rows = featurize_smiles_file(args.smiles, hyper)
    else:
        rows = featurize_sdf(args.sdf, hyper, with_pos)
    samples = [s for _, s in rows if s is not None]
    if not samples:
        raise ValueError("no parseable molecules in the input")

    if method in GRAPH_METHODS:
        model = create_model(method, num_target=1, cfg=cfg, gnn_type=method)
    else:
        model = create_model(method, num_target=1, cfg=cfg)

    spec = spec_for_samples(samples, batch_size=args.batch_size)
    batches = iter_batches(
        samples, spec, hyper=hyper, target=0, with_pos=with_pos
    )
    variables = {"params": state["params"]}
    if state.get("batch_stats"):
        variables["batch_stats"] = state["batch_stats"]

    @jax.jit
    def forward(batch):
        return model.apply(variables, batch, deterministic=True)

    preds: list[float] = []
    for batch in batches:
        out = np.asarray(forward(batch))
        mask = np.asarray(batch.graph_mask)
        preds.extend((out[mask] * std).tolist())

    it = iter(preds)
    with open(args.out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["index", "title", "prediction"])
        for i, (title, s) in enumerate(rows):
            w.writerow([i, title, next(it) if s is not None else "nan"])
    print(f"wrote {len(rows)} predictions ({len(preds)} valid) to {args.out}")
    return args.out


def main():
    run(build_parser().parse_args())


if __name__ == "__main__":
    main()
