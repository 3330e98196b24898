"""Benchmark: flagship training throughput on the real TPU chip.

Measures molecules/sec/chip for a jitted `egnn_equihnns` training step at the
reference benchmark recipe (hidden 256, 3 conv layers, output hidden 128,
batch 768, mean aggregation — `reference scripts/run_qm9_3d.sh:11-31`) on
QM9-like synthetic molecules (RDKit/network are unavailable in this image;
shapes and sparsity match QM9 with explicit H).

Measurement notes for the axon-tunneled TPU: eager (non-jit) ops cost ~100 s
each (per-op remote compile) and `block_until_ready` does not synchronize —
so everything here is jitted, molecule counts come from host numpy, and
timing brackets chained steps with a single scalar fetch (a true sync).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` compares against BENCH_BASELINE.json if present (committed from
a previous round), else 1.0.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from equihgnn_tpu import create_model
    from equihgnn_tpu.data.batching import iter_batches, spec_for_samples
    from equihgnn_tpu.data.synthetic import make_synthetic_dataset
    from equihgnn_tpu.models.config import ModelConfig

    BATCH = 768
    HIDDEN = 256

    samples = make_synthetic_dataset(2 * BATCH, seed=0, num_targets=1)
    for s in samples:
        s.y = np.float32((s.n_atoms - 16.0) / 8.0)
    spec = spec_for_samples(samples, batch_size=BATCH)
    # packed slot rows: ~25% faster than per-molecule rows (same numerics,
    # see tests/test_packed_rows.py)
    from equihgnn_tpu.data.batching import pad_hypergraph_batch

    groups, g, na, ne, nz = [], [], 0, 0, 0
    for s in samples:
        if (len(g) >= spec.max_real_graphs or na + s.n_atoms > spec.num_atoms
                or ne + s.n_hedges > spec.num_hedges or nz + s.nnz > spec.nnz):
            groups.append(g); g, na, ne, nz = [], 0, 0, 0
        g.append(s); na += s.n_atoms; ne += s.n_hedges; nz += s.nnz
    if g:
        groups.append(g)
    host_batches = [
        pad_hypergraph_batch(gr, spec, with_pos=True, pack_slots=True)
        for gr in groups
    ]
    mols_per_batch = [int(b.graph_mask.sum()) for b in host_batches]
    batches = [jax.tree.map(jnp.asarray, b) for b in host_batches]

    cfg = ModelConfig(
        mlp_hidden=HIDDEN,
        output_hidden=128,
        all_num_layers=3,
        output_num_layers=3,
        aggregate="mean",
        normalization="ln",
    )
    model = create_model("egnn_equihnns", num_target=1, cfg=cfg)
    variables = jax.jit(
        lambda b: model.init(jax.random.PRNGKey(0), b, deterministic=True)
    )(batches[0])
    params = variables["params"]
    tx = optax.adam(1e-4)
    opt_state = jax.jit(tx.init)(params)

    def loss_fn(p, batch, rng):
        out = model.apply(
            {"params": p}, batch, deterministic=False, rngs={"dropout": rng}
        )
        m = batch.graph_mask.astype(out.dtype)
        return jnp.sum((out - batch.y) ** 2 * m) / jnp.maximum(jnp.sum(m), 1.0)

    @jax.jit
    def step(p, s, batch, rng):
        l, g = jax.value_and_grad(loss_fn)(p, batch, rng)
        up, s = tx.update(g, s, p)
        return optax.apply_updates(p, up), s, l

    rng = jax.random.PRNGKey(1)
    # compile + warmup, hard-synced via scalar fetch
    for b in batches[:2]:
        params, opt_state, l = step(params, opt_state, b, rng)
    float(l)

    n_steps, n_mols = 0, 0
    t0 = time.perf_counter()
    for _ in range(5):
        for b, m in zip(batches, mols_per_batch):
            params, opt_state, l = step(params, opt_state, b, rng)
            n_steps += 1
            n_mols += m
    float(l)  # single true sync at the end
    dt = time.perf_counter() - t0

    mols_per_sec = n_mols / dt
    baseline = None
    if os.path.exists("BENCH_BASELINE.json"):
        with open("BENCH_BASELINE.json") as f:
            baseline = json.load(f).get("value")
    vs = mols_per_sec / baseline if baseline else 1.0
    print(
        json.dumps(
            {
                "metric": "qm9_synthetic_train_molecules_per_sec_per_chip",
                "value": round(mols_per_sec, 1),
                "unit": "molecules/sec/chip",
                "vs_baseline": round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
