"""Remat memory win, measured (VERDICT r1 #8): HBM high-water of the jitted
train step with vs without `ModelConfig.remat`, via XLA's compile-time
memory analysis (no execution needed).

    python scripts/remat_bench.py [--methods equiformer_equihnns se3_transformer_equihnns]
"""

from __future__ import annotations

import argparse
import dataclasses
import json


def analyze(method: str, remat: bool, batch: int = 768):
    import jax
    import jax.numpy as jnp
    import optax

    from equihgnn_tpu import create_model
    from equihgnn_tpu.data.batching import spec_for_samples
    from equihgnn_tpu.data.packed import PackedSamples, iter_packed_batches
    from equihgnn_tpu.data.synthetic import make_synthetic_dataset
    from equihgnn_tpu.models.config import ModelConfig

    samples = make_synthetic_dataset(batch, seed=0, num_targets=1)
    spec = spec_for_samples(samples, batch_size=batch)
    packed = PackedSamples.from_samples(samples)
    pack = not method.startswith("faformer")
    b = next(iter(iter_packed_batches(packed, spec, target=0, with_pos=True,
                                      pack_slots=pack)))
    b = jax.tree.map(jnp.asarray, b)

    cfg = ModelConfig(
        mlp_hidden=256, output_hidden=128, all_num_layers=3,
        output_num_layers=3, aggregate="mean", normalization="ln",
        remat=remat,
    )
    model = create_model(method, num_target=1, cfg=cfg)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), b, deterministic=True)
    )
    params = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), variables["params"]
    )
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)

    def loss_fn(p, batch, rng):
        out = model.apply({"params": p}, batch, deterministic=False,
                          rngs={"dropout": rng})
        m = batch.graph_mask.astype(out.dtype)
        return jnp.sum((out - batch.y) ** 2 * m) / jnp.maximum(jnp.sum(m), 1.0)

    def step(p, s, batch, rng):
        l, g = jax.value_and_grad(loss_fn)(p, batch, rng)
        up, s = tx.update(g, s, p)
        return optax.apply_updates(p, up), s, l

    compiled = (
        jax.jit(step)
        .lower(params, opt_state, b, jax.random.PRNGKey(1))
        .compile()
    )
    ma = compiled.memory_analysis()
    out = {"method": method, "remat": remat, "batch": batch}
    if ma is not None:
        for k in ("temp_size_in_bytes", "argument_size_in_bytes",
                  "output_size_in_bytes", "generated_code_size_in_bytes"):
            v = getattr(ma, k, None)
            if v is not None:
                out[k.replace("_in_bytes", "_gb")] = round(v / 2**30, 3)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--methods", nargs="+",
                    default=["equiformer_equihnns", "egnn_equihnns"])
    ap.add_argument("--batch", type=int, default=768)
    args = ap.parse_args()
    for m in args.methods:
        for remat in (False, True):
            try:
                print(json.dumps(analyze(m, remat, args.batch)), flush=True)
            except Exception as e:
                print(json.dumps({"method": m, "remat": remat,
                                  "error": str(e)[-200:]}), flush=True)


if __name__ == "__main__":
    main()
