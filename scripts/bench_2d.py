"""Bench the 2-D GNN baselines (gin/gcn/gat/gatv2) on the real chip.

BASELINE.json config 1 is `gin` on QM9; this measures the plain-graph path
(pad_graph_batch, GNN_2D with its reference defaults num_layer=5 emb 300 —
`reference main.py:28-34` / `baseline_2d.py:82-92`) at batch 768.

    python scripts/bench_2d.py [gin gcn gat gatv2]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

BATCH = 768


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    methods = args or ["gin", "gcn", "gat", "gatv2"]

    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from equihgnn_tpu import create_model
    from equihgnn_tpu.data.batching import pad_graph_batch, spec_for_samples
    from equihgnn_tpu.data.synthetic import make_synthetic_dataset

    samples = make_synthetic_dataset(2 * BATCH, seed=0, hyper=False,
                                     num_targets=1)
    for s in samples:
        s.y = np.float32((s.n_atoms - 16.0) / 8.0)
    spec = spec_for_samples(samples, batch_size=BATCH)
    host = [
        pad_graph_batch(samples[i:i + BATCH], spec, target=None)
        for i in range(0, len(samples), BATCH)
    ]
    mols = [int(b.graph_mask.sum()) for b in host]
    batches = [jax.tree.map(jnp.asarray, b) for b in host]

    for method in methods:
        # GNN_2D reference construction: (num_target, gnn_type, drop_ratio)
        # with defaults num_layer=5, emb_dim=300 (`reference main.py:28-34`)
        model = create_model(method, num_target=1, gnn_type=method)
        variables = jax.jit(
            lambda b: model.init(jax.random.PRNGKey(0), b, deterministic=True)
        )(batches[0])
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        tx = optax.adam(1e-4)
        opt_state = jax.jit(tx.init)(params)

        def loss_fn(p, bs, batch, rng):
            kw = dict(deterministic=False, rngs={"dropout": rng})
            if bs:
                out, mut = model.apply(
                    {"params": p, "batch_stats": bs}, batch,
                    mutable=["batch_stats"], **kw,
                )
                bs = mut["batch_stats"]
            else:
                out = model.apply({"params": p}, batch, **kw)
            m = batch.graph_mask.astype(out.dtype)
            loss = jnp.sum((out - batch.y) ** 2 * m) / jnp.maximum(
                jnp.sum(m), 1.0
            )
            return loss, bs

        @jax.jit
        def step(p, s, bs, batch, rng):
            (l, bs), g = jax.value_and_grad(loss_fn, has_aux=True)(
                p, bs, batch, rng
            )
            up, s = tx.update(g, s, p)
            return optax.apply_updates(p, up), s, bs, l

        rng = jax.random.PRNGKey(1)
        for b in batches[:2]:
            params, opt_state, batch_stats, l = step(
                params, opt_state, batch_stats, b, rng
            )
        float(l)

        n_steps, n_mols = 0, 0
        t0 = time.perf_counter()
        for _ in range(5):
            for b, m in zip(batches, mols):
                params, opt_state, batch_stats, l = step(
                    params, opt_state, batch_stats, b, rng
                )
                n_steps += 1
                n_mols += m
        float(l)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "method": method,
            "molecules_per_sec_per_chip": round(n_mols / dt, 1),
            "step_time_ms": round(1e3 * dt / n_steps, 3),
        }))


if __name__ == "__main__":
    main()
