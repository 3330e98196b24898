"""Training CLI — mirrors `reference main.py:154-298` flag-for-flag.

Usage:
    python -m equihgnn_tpu.main --method mhnns --data synthetic_hg --epochs 3

Parity notes (documented decisions, SURVEY §2.1):
  * `--clip_gnorm` is parsed but a no-op in the reference (never passed to the
    Trainer); here it actually clips when set — pass nothing to replicate.
  * `--min_lr` is unused in the reference (plateau floor is lr*1e-5); same here
    unless `--use_min_lr` is given.
  * `--device` is accepted and ignored (Lightning used devices="auto"); the
    TPU build uses all visible devices when `--data_parallel` is set.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from equihgnn_tpu import create_model
from equihgnn_tpu.common.registry import registry
from equihgnn_tpu.data.batching import (
    iter_batches,
    pad_graph_batch,
    pad_hypergraph_batch,
    spec_for_samples,
)
from equihgnn_tpu.data.packed import PackedSamples, iter_packed_batches
from equihgnn_tpu.data.splits import create_train_val_test_set_and_normalize
from equihgnn_tpu.models.config import ModelConfig
from equihgnn_tpu.train.trainer import TrainConfig, Trainer


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Training with MHNN (TPU-native)")
    # Dataset arguments (reference main.py:162-164)
    p.add_argument("--data_dir", type=str, default="datasets/opv3d")
    p.add_argument("--target", type=int, default=0, help="target of dataset")
    p.add_argument("--data", default="opv_hg", help="data type")
    # Training hyperparameters (reference main.py:167-175)
    p.add_argument("--runs", default=1, type=int)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--device", type=int, default=0)  # accepted, ignored
    p.add_argument("--epochs", default=300, type=int)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--lr", default=0.0001, type=float)
    p.add_argument("--min_lr", default=0.000001, type=float)
    p.add_argument("--use_min_lr", action="store_true")
    p.add_argument("--wd", default=0.0, type=float)
    p.add_argument("--clip_gnorm", default=None, type=float)
    # Model hyperparameters (reference main.py:178-203)
    p.add_argument("--method", default="mhnns", help="model type")
    p.add_argument("--All_num_layers", default=3, type=int)
    p.add_argument("--MLP1_num_layers", default=2, type=int)
    p.add_argument("--MLP2_num_layers", default=2, type=int)
    p.add_argument("--MLP3_num_layers", default=2, type=int)
    p.add_argument("--MLP4_num_layers", default=2, type=int)
    p.add_argument("--MLP_hidden", default=64, type=int)
    p.add_argument("--output_num_layers", default=2, type=int)
    p.add_argument("--output_hidden", default=64, type=int)
    p.add_argument("--aggregate", default="mean", choices=["sum", "mean"])
    p.add_argument("--normalization", default="ln", choices=["bn", "ln", "None"])
    p.add_argument("--activation", default="relu", choices=["Id", "relu", "prelu"])
    p.add_argument("--dropout", default=0.0, type=float)
    # Debugging (reference main.py:206-208) + TPU extensions
    p.add_argument("--debug", action="store_true", help="one train/val step only")
    p.add_argument("--data_parallel", action="store_true")
    p.add_argument("--num_devices", default=None, type=int)
    p.add_argument("--synthetic_size", default=None, type=int)
    # Molecule3D-size validation knob (molecules up to low hundreds of
    # atoms, `reference equihgnn/data/molecule3d.py:125-260`)
    p.add_argument("--synthetic_max_atoms", default=29, type=int)
    p.add_argument("--pack_slots", action="store_true",
                   help="pack small molecules into shared dense slot rows")
    p.add_argument("--buckets", default=None, type=str,
                   help="comma-separated atom-count boundaries for size-"
                        "bucketed batching (tight per-bucket specs), e.g. '16,24'")
    p.add_argument("--streaming", action="store_true",
                   help="object-free packed data path: no per-sample Python "
                        "objects, generator batches (bounded memory; for "
                        "multi-million-molecule datasets)")
    p.add_argument(
        "--compute_dtype", default=None, choices=["bfloat16"],
        help="bf16 activations in the geometric encoders (params stay f32; "
             "measured: visnet 1.39x, faformer 1.10x — PERF.md)",
    )
    p.add_argument("--remat", action="store_true",
                   help="additionally checkpoint whole encoders")
    p.add_argument(
        "--platform", default=None, choices=["cpu", "tpu", "axon"],
        help="force a JAX platform (the image pins axon via sitecustomize)",
    )
    return p


GRAPH_METHODS = ("gin", "gcn", "gat", "gatv2")


def _enable_compile_cache():
    """Persistent XLA compilation cache: first compile of a (model, batch
    spec) is 20-40 s on the TPU; reruns of the same config hit the disk
    cache. Off with EQUIHGNN_TPU_COMPILE_CACHE=0 or an unwritable dir."""
    cache = os.environ.get(
        "EQUIHGNN_TPU_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "equihgnn_tpu_xla"),
    )
    if cache in ("0", ""):
        return
    try:
        import jax

        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # pragma: no cover - cache is best-effort
        print(f"[main] compilation cache disabled: {e}")


def run(args) -> dict:
    # --platform flag, or EQUIHGNN_TPU_PLATFORM env (lets the smoke scripts
    # run on CPU in CI without editing their parity-mirroring arg lists)
    platform = getattr(args, "platform", None) or os.environ.get(
        "EQUIHGNN_TPU_PLATFORM"
    )
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)

    _enable_compile_cache()

    import equihgnn_tpu.data.datasets  # noqa: F401
    import equihgnn_tpu.models  # noqa: F401

    if args.data_parallel:
        from equihgnn_tpu.parallel.mesh import maybe_init_distributed

        if maybe_init_distributed():
            print("jax.distributed initialized (multi-host mesh)")

    if args.streaming:
        return _run_streaming(args)

    data_kwargs = {}
    if args.data.startswith("synthetic") and args.synthetic_size:
        data_kwargs["size"] = args.synthetic_size

    train_s, valid_s, test_s, std = create_train_val_test_set_and_normalize(
        target=args.target,
        data_name=args.data,
        data_dir=args.data_dir,
        **data_kwargs,
    )
    data_cls = registry.get_data_class(args.data)
    hyper = data_cls.hyper
    with_pos = data_cls.has_pos

    all_samples = train_s + valid_s + test_s
    spec = spec_for_samples(all_samples, batch_size=args.batch_size)
    pack = bool(args.pack_slots) and hyper and args.method.startswith(
        ("egnn", "visnet", "equiformer", "se3", "faformer")
    )
    if hyper:
        make_empty = lambda: pad_hypergraph_batch(
            [], spec, target=None, with_pos=with_pos, pack_slots=pack
        )
    else:
        ef_width = all_samples[0].edge_feat.shape[1]
        make_empty = lambda: pad_graph_batch(
            [], spec, target=None, with_pos=with_pos, edge_feat_width=ef_width
        )

    # select target column once, host-side
    for s in all_samples:
        s.y = np.asarray(s.y, dtype=np.float32).reshape(-1)[args.target]

    # hypergraph batches go through the packed representation + native C++
    # packer (equihgnn_tpu/native/packer.cpp); pack_batch falls back to the
    # Python packer automatically when no compiler is available
    packed_splits = (
        {
            id(s): PackedSamples.from_samples(s)
            for s in (train_s, valid_s, test_s)
            if s
        }
        if hyper
        else {}
    )

    def loader(samples, shuffle, epoch=0):
        rng = np.random.default_rng(args.seed * 100003 + epoch)
        if hyper:
            return iter_packed_batches(
                packed_splits[id(samples)],
                spec,
                target=None,  # y already normalized + selected above
                with_pos=with_pos,
                shuffle=shuffle,
                rng=rng,
                pack_slots=pack,
            )
        return iter_batches(
            samples,
            spec,
            hyper=hyper,
            target=None,
            with_pos=with_pos,
            shuffle=shuffle,
            rng=rng,
        )

    results = []
    for run_idx in range(args.runs):
        seed = args.seed + run_idx
        print(f"\nRun No. {run_idx + 1}:\nSeed: {seed}\n")
        exp = f"{args.data}_{args.target}_{args.method}"
        version = 0
        while os.path.exists(os.path.join("logs", exp, f"version_{version}")):
            version += 1
        log_dir = os.path.join("logs", exp, f"version_{version}")

        import dataclasses

        cfg = ModelConfig.from_args(args)
        if args.data_parallel:
            cfg = dataclasses.replace(cfg, axis_name="data")
        if args.method in GRAPH_METHODS:
            model = create_model(
                args.method, num_target=1, cfg=cfg, gnn_type=args.method
            )
        else:
            model = create_model(args.method, num_target=1, cfg=cfg)

        tcfg = TrainConfig(
            epochs=args.epochs,
            lr=args.lr,
            weight_decay=args.wd,
            clip_gnorm=args.clip_gnorm,
            seed=seed,
            min_lr=args.min_lr if args.use_min_lr else None,
            log_dir=log_dir,
            data_parallel=args.data_parallel,
            num_devices=args.num_devices,
            debug=args.debug,
            run_meta={
                "method": args.method,
                "model_config": dataclasses.asdict(cfg),
                "std": float(std),
                "target": args.target,
                "data": args.data,
            },
        )
        example = next(iter(loader(train_s, False)))
        trainer = Trainer(model, tcfg, example, std=std)
        best = trainer.fit(
            lambda epoch: loader(train_s, True, epoch),
            lambda: loader(valid_s, False),
            make_empty=make_empty,
        )
        metrics = trainer.test(
            lambda: loader(test_s, False),
            restore_best=not args.debug,
            make_empty=make_empty,
        )
        print(json.dumps({**best, **metrics}, indent=2))
        results.append({**best, **metrics})
    return results[-1]


def _run_streaming(args) -> dict:
    """Object-free packed data path (SURVEY Phase 5: 3.7M-molecule scale).

    No per-sample Python objects and no batch lists: splits are index arrays,
    normalization runs on the packed y column, batches stream from the native
    packer. `--buckets` gives each atom-size range a tight static spec
    (padding-waste stats are printed); the jitted step recompiles once per
    bucket spec.
    """
    import dataclasses

    from equihgnn_tpu.data.packed import (
        iter_bucketed_packed_batches,
        iter_packed_batches,
        make_packed_buckets,
        packed_from_cache,
        packed_from_dir,
        padding_waste_stats,
        save_packed_dir,
    )

    if args.data.startswith("synthetic"):
        from equihgnn_tpu.data.synthetic import make_synthetic_packed

        # EQUIHGNN_SYNTH_CACHE: persist the generated PackedSamples as an
        # mmap dir so multi-million-molecule runs (the PCQM4Mv2-scale
        # demonstration, SCALE.md) don't pay the ~1 h generation on every
        # attempt. The cache is keyed by the caller; size mismatch falls
        # back to regeneration.
        cache = os.environ.get("EQUIHGNN_SYNTH_CACHE")
        size = args.synthetic_size or 10_000
        packed = None
        if cache and os.path.exists(os.path.join(cache, "af_off.npy")):
            packed = packed_from_dir(cache, mmap=True)
            if packed.n != size:
                packed = None
        if packed is None:
            packed = make_synthetic_packed(
                size, seed=0, num_targets=16,
                max_atoms=args.synthetic_max_atoms,
            )
            if cache:
                save_packed_dir(packed, cache)
                packed = packed_from_dir(cache, mmap=True)
        with_pos = args.data.endswith("_3d")
    else:
        # featurize-once cache (built on first use), then load object-free
        data_cls = registry.get_data_class(args.data)
        if not data_cls.hyper:
            raise ValueError("--streaming supports hypergraph datasets")
        ds = data_cls(root=args.data_dir)
        path = ds.processed_path
        with_pos = data_cls.has_pos
        del ds
        packed = packed_from_cache(path)

    # 80/10/10 split as index arrays; whole-dataset normalization leak
    # replicated (`reference data_split.py:68-72`)
    rng = np.random.default_rng(0)
    perm = rng.permutation(packed.n)
    n_train, n_valid = int(0.8 * packed.n), int(0.1 * packed.n)
    splits = {
        "train": perm[:n_train],
        "valid": perm[n_train : n_train + n_valid],
        "test": perm[n_train + n_valid :],
    }
    mean = packed.y.mean(axis=0)
    std_all = packed.y.std(axis=0, ddof=1)
    std_all = np.where(std_all == 0, 1.0, std_all)
    packed.y = ((packed.y - mean) / std_all).astype(np.float32)
    t = int(args.target) if packed.y.ndim > 1 and packed.y.shape[1] > 1 else 0
    std = float(std_all.reshape(-1)[t])

    if args.buckets:
        bounds = [int(x) for x in args.buckets.split(",")]
        buckets = make_packed_buckets(packed, args.batch_size, bounds)
        waste = padding_waste_stats(packed, buckets)
        print("bucket stats:", json.dumps(waste))


        def split_buckets(idx):
            out = []
            for sel, spec in buckets:
                inter = np.intersect1d(sel, idx, assume_unique=False)
                if len(inter):
                    out.append((inter, spec))
            return out

        per_split = {k: split_buckets(v) for k, v in splits.items()}
    else:
        from equihgnn_tpu.data.batching import BatchSpec, _round_up

        na, ne, nz = packed.sizes()
        cap = lambda arr: _round_up(
            max(int(args.batch_size * float(arr.mean()) * 1.05),
                int(arr.max()) + 1), 8,
        )
        a_max = _round_up(int(na.max()), 8)
        num_atoms = cap(na)
        spec = BatchSpec(
            num_graphs=args.batch_size + 1, num_atoms=num_atoms,
            num_hedges=cap(ne), nnz=cap(nz), max_atoms_per_graph=a_max,
            num_slot_rows=int(num_atoms / a_max * 1.15) + 3,
        )
        per_split = {k: [(v, spec)] for k, v in splits.items()}

    pack = bool(args.pack_slots) and args.method.startswith(
        ("egnn", "visnet", "equiformer", "se3", "faformer")
    )

    def loader(split, shuffle, epoch=0):
        return iter_bucketed_packed_batches(
            packed, per_split[split], target=args.target,
            with_pos=with_pos, shuffle=shuffle,
            rng=np.random.default_rng(args.seed * 100003 + epoch),
            pack_slots=pack,
        )

    results = []
    for run_idx in range(args.runs):
        seed = args.seed + run_idx
        print(f"\nRun No. {run_idx + 1} (streaming):\nSeed: {seed}\n")
        exp = f"{args.data}_{args.target}_{args.method}_streaming"
        version = 0
        while os.path.exists(os.path.join("logs", exp, f"version_{version}")):
            version += 1
        log_dir = os.path.join("logs", exp, f"version_{version}")

        cfg = ModelConfig.from_args(args)
        if args.data_parallel:
            cfg = dataclasses.replace(cfg, axis_name="data")
        model = create_model(args.method, num_target=1, cfg=cfg)
        tcfg = TrainConfig(
            epochs=args.epochs, lr=args.lr, weight_decay=args.wd,
            clip_gnorm=args.clip_gnorm, seed=seed,
            min_lr=args.min_lr if args.use_min_lr else None,
            log_dir=log_dir, data_parallel=args.data_parallel,
            num_devices=args.num_devices, debug=args.debug,
            run_meta={
                "method": args.method,
                "model_config": dataclasses.asdict(cfg),
                "std": float(std),
                "target": args.target,
                "data": args.data,
            },
        )
        example = next(iter(loader("train", False)))
        trainer = Trainer(model, tcfg, example, std=std)
        best = trainer.fit(
            lambda epoch: loader("train", True, epoch),
            lambda: loader("valid", False),
        )
        metrics = trainer.test(
            lambda: loader("test", False), restore_best=not args.debug
        )
        print(json.dumps({**best, **metrics}, indent=2))
        results.append({**best, **metrics})
    return results[-1]


def main():
    print("Task start time:")
    print(time.strftime("%Y-%m-%d %H:%M:%S", time.localtime()))
    start = time.time()
    args = build_parser().parse_args()
    print(args)
    run(args)
    print("Task end time:")
    print(time.strftime("%Y-%m-%d %H:%M:%S", time.localtime()))
    print("Total time taken: {} s.".format(int(time.time() - start)))


if __name__ == "__main__":
    main()
