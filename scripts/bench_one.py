"""Bench one method on the real chip, optionally with compute_dtype override.

    python scripts/bench_one.py <method> [bfloat16]

Prints one JSON line. Obeys the axon discipline: no other TPU client may run
concurrently; never kill this mid-work (wedges the remote claim).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    method = sys.argv[1]
    dtype = sys.argv[2] if len(sys.argv) > 2 else None
    remat = len(sys.argv) > 3 and sys.argv[3] in ("remat", "1", "true")

    import jax
    import jax.numpy as jnp
    import optax

    import bench
    from equihgnn_tpu import create_model
    from equihgnn_tpu.models.config import ModelConfig

    pack_slots = True
    batches, mols = bench._make_batches(pack_slots)
    cfg = ModelConfig(
        mlp_hidden=bench.HIDDEN, output_hidden=128, all_num_layers=3,
        output_num_layers=3, aggregate="mean", normalization="ln",
        compute_dtype=dtype, remat=remat,
    )
    model = create_model(method, num_target=1, cfg=cfg)
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

    rng = jax.random.key(1, impl="rbg")  # TPU-native dropout RNG (PERF.md)
    for b in batches[:2]:
        params, opt_state, l = step(params, opt_state, b, rng)
    float(l)

    n_steps, n_mols = 0, 0
    t0 = time.perf_counter()
    for _ in range(5):
        for b, m in zip(batches, mols):
            params, opt_state, l = step(params, opt_state, b, rng)
            n_steps += 1
            n_mols += m
    float(l)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "method": method, "compute_dtype": dtype or "float32",
        "molecules_per_sec_per_chip": round(n_mols / dt, 1),
        "step_time_ms": round(1e3 * dt / n_steps, 3),
        "final_loss": round(float(l), 5),
    }))


if __name__ == "__main__":
    main()
