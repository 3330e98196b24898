"""Roofline floors for the benched encoders (VERDICT round-3 #5 / weak #7).

For each method, compile the EXACT bench train step (same shapes, dtype, and
code path as `bench.py`) and pull XLA's compiled cost analysis: algebraic
FLOPs and HBM bytes accessed (per-fusion operands+outputs of the optimized
HLO — fusion internals are free, which is what HBM traffic means). From
those, two floors on the v5e:

    compute_floor_ms = flops / 197 TFLOP/s (bf16 MXU peak)
    hbm_floor_ms     = bytes / 819 GB/s    (HBM bandwidth)
    floor_ms         = max(compute_floor_ms, hbm_floor_ms)

and the measured step (from BENCH_ENCODERS.json, or --measure to time it
here) is compared against them: `x_of_floor` = measured / floor. A step at
1.0-1.5x its floor is bound by the stated resource; beyond that the gap is
schedulable work (fragmentation, serial ops, stalls).

Writes ROOFLINE.json keyed `{method}:{dtype}`.

Usage: python scripts/roofline.py [--methods m1,m2] [--dtype bfloat16]
           [--measure]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_FLOPS = 197e12  # v5e bf16 dense
HBM_BW = 819e9  # v5e HBM GB/s

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "ROOFLINE.json",
)
BENCH_ENC = os.path.join(os.path.dirname(OUT), "BENCH_ENCODERS.json")


def analyze(method: str, dtype: str | None, measure: bool) -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    import bench
    from equihgnn_tpu import create_model
    from equihgnn_tpu.main import _enable_compile_cache
    from equihgnn_tpu.models.config import ModelConfig

    _enable_compile_cache()
    batches, mols = bench._make_batches(True)
    cfg = ModelConfig(
        mlp_hidden=bench.HIDDEN, output_hidden=128, all_num_layers=3,
        output_num_layers=3, aggregate="mean", normalization="ln",
        compute_dtype=dtype,
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

    rng = jax.random.key(1, impl="rbg")
    compiled = step.lower(params, opt_state, batches[0], rng).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    bytes_acc = float(cost.get("bytes accessed", 0.0))

    compute_floor_ms = 1e3 * flops / PEAK_FLOPS
    hbm_floor_ms = 1e3 * bytes_acc / HBM_BW
    row = {
        "method": method,
        "compute_dtype": dtype or "float32",
        "tflops_per_step": round(flops / 1e12, 4),
        "hbm_gb_per_step": round(bytes_acc / 1e9, 3),
        "compute_floor_ms": round(compute_floor_ms, 3),
        "hbm_floor_ms": round(hbm_floor_ms, 3),
        "floor_ms": round(max(compute_floor_ms, hbm_floor_ms), 3),
        "bound_by": (
            "compute" if compute_floor_ms >= hbm_floor_ms else "hbm"
        ),
    }

    measured = None
    if measure:
        import time as _t

        for b in batches[:2]:
            params, opt_state, l = step(params, opt_state, b, rng)
        float(l)
        n = 0
        t0 = _t.perf_counter()
        for _ in range(5):
            for b in batches:
                params, opt_state, l = step(params, opt_state, b, rng)
                n += 1
        float(l)
        measured = 1e3 * (_t.perf_counter() - t0) / n
    else:
        try:
            with open(BENCH_ENC) as f:
                enc = json.load(f)
            r = enc.get(method) or {}
            if (dtype or "float32") != "float32":
                r = r.get("bf16") or {}
            measured = r.get("step_time_ms")
        except Exception:
            pass
    if measured:
        row["measured_step_ms"] = round(measured, 3)
        row["x_of_floor"] = round(measured / row["floor_ms"], 2)
        row["x_of_hbm_floor"] = round(measured / hbm_floor_ms, 2)
        row["achieved_gbps"] = round(bytes_acc / (measured / 1e3) / 1e9, 1)
        row["achieved_tflops"] = round(flops / (measured / 1e3) / 1e12, 2)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--methods",
        default="egnn_equihnns,equiformer_equihnns,visnet_equihnns,"
        "se3_transformer_equihnns,faformer_equihnns",
    )
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--measure", action="store_true",
                    help="time the step here instead of BENCH_ENCODERS.json")
    a = ap.parse_args()
    dtype = None if a.dtype in ("float32", "f32", "none") else a.dtype

    existing = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            existing = json.load(f)
    for m in a.methods.split(","):
        m = m.strip()
        print(f"[roofline] {m} ({a.dtype}) ...", flush=True)
        row = analyze(m, dtype, a.measure)
        existing[f"{m}:{a.dtype}"] = row
        print(json.dumps(row))
        with open(OUT, "w") as f:
            json.dump(existing, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
