"""Split + target normalization (`reference equihgnn/utils/data_split.py:8-79`).

Semantics replicated:
  * OPV family (partitioned): shipped train/valid/test partitions; polymer
    flag from target id (0-3 molecular / 4-7 polymer); per-column
    normalization by the TRAIN split's mean/std.
  * everything else: 80/10/10 random split; per-column normalization by the
    WHOLE dataset's mean/std — a mild normalization leak the reference has
    (`data_split.py:68-72`); replicated by default, fixable with
    `train_stats_only=True`.
  * returns the scalar std of the selected target (used to de-normalize
    eval metrics, `reference main.py:68,102`).

Deviation (documented): the reference's random_split is unseeded at call time
(it runs before `seed_everything`); we take an explicit `split_seed` so runs
are reproducible.
"""

from __future__ import annotations

import numpy as np

from equihgnn_tpu.common.registry import registry


def _normalize(samples_splits, mean: np.ndarray, std: np.ndarray):
    for split in samples_splits:
        for s in split:
            s.y = ((np.asarray(s.y, dtype=np.float32) - mean) / std).astype(
                np.float32
            )


def create_train_val_test_set_and_normalize(
    target: int,
    data_name: str,
    data_dir: str,
    split_seed: int = 0,
    train_stats_only: bool = False,
    **data_kwargs,
):
    import equihgnn_tpu.data.datasets  # noqa: F401 — registration

    data_cls = registry.get_data_class(data_name)
    if data_cls is None:
        raise ValueError(f"Unknown dataset name: {data_name!r}")
    print(f"Use {data_cls.__name__} dataset")

    if getattr(data_cls, "partitioned", False):
        if target in (0, 1, 2, 3):
            polymer = False
        elif target in (4, 5, 6, 7):
            polymer = True
        else:
            raise Exception("Invalid target value!")
        train = data_cls(root=data_dir, partition="train", polymer=polymer, **data_kwargs)
        valid = data_cls(root=data_dir, partition="valid", polymer=polymer, **data_kwargs)
        test = data_cls(root=data_dir, partition="test", polymer=polymer, **data_kwargs)
        train_s, valid_s, test_s = list(train.samples), list(valid.samples), list(test.samples)
        y = np.stack([np.asarray(s.y, dtype=np.float32) for s in train_s])
        mean, std = y.mean(axis=0), y.std(axis=0, ddof=1)
    else:
        ds = data_cls(root=data_dir, **data_kwargs)
        n = len(ds)
        rng = np.random.default_rng(split_seed)
        perm = rng.permutation(n)
        n_train, n_valid = int(0.8 * n), int(0.1 * n)
        idx_train = perm[:n_train]
        idx_valid = perm[n_train : n_train + n_valid]
        idx_test = perm[n_train + n_valid :]
        train_s = [ds.samples[i] for i in idx_train]
        valid_s = [ds.samples[i] for i in idx_valid]
        test_s = [ds.samples[i] for i in idx_test]
        stat_samples = train_s if train_stats_only else ds.samples
        y = np.stack([np.asarray(s.y, dtype=np.float32) for s in stat_samples])
        # torch .std() is the unbiased (ddof=1) estimator
        mean, std = y.mean(axis=0), y.std(axis=0, ddof=1)

    std = np.where(std == 0, 1.0, std)
    _normalize((train_s, valid_s, test_s), mean, std)
    t = int(target) if y.ndim > 1 and y.shape[1] > 1 else 0
    return train_s, valid_s, test_s, float(std.reshape(-1)[t])
