"""Capture a device trace of one benched method's train step and print the
top HLO ops by self time.

    python scripts/trace_top_ops.py se3_transformer_equihnns [n_top]

Uses tensorboard_plugin_profile's xplane converter for per-op stats —
attribution includes stall time (PERF.md), so read alongside ablation probes.
"""

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    method = sys.argv[1] if len(sys.argv) > 1 else "se3_transformer_equihnns"
    n_top = int(sys.argv[2]) if len(sys.argv) > 2 else 25

    import jax
    import jax.numpy as jnp
    import optax

    import bench
    from equihgnn_tpu import create_model
    from equihgnn_tpu.models.config import ModelConfig

    pack_slots = not method.startswith("faformer")
    batches, _ = bench._make_batches(pack_slots)
    cfg = ModelConfig(
        mlp_hidden=bench.HIDDEN, output_hidden=128, all_num_layers=3,
        output_num_layers=3, aggregate="mean", normalization="ln",
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

    rng = jax.random.PRNGKey(1)
    for b in batches[:2]:
        params, opt_state, l = step(params, opt_state, b, rng)
    float(l)

    trace_dir = f"/tmp/trace_{method}"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            for b in batches:
                params, opt_state, l = step(params, opt_state, b, rng)
        float(l)

    xplanes = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    assert xplanes, f"no xplane under {trace_dir}"
    xplane = max(xplanes, key=os.path.getmtime)

    from tensorboard_plugin_profile.convert import raw_to_tool_data as rd

    data, _ = rd.xspace_to_tool_data([xplane], "hlo_stats", {})
    if isinstance(data, bytes):
        data = gzip.decompress(data).decode()
    table = json.loads(data)
    # GViz table: {cols: [...], rows: [{c: [{v: ...}...]}...]}
    cols = [c["label"] for c in table[0]["cols"]] if isinstance(table, list) else [
        c["label"] for c in table["cols"]
    ]
    rows = (table[0] if isinstance(table, list) else table)["rows"]

    def col(name):
        for i, c in enumerate(cols):
            if name.lower() in c.lower():
                return i
        raise KeyError(f"{name} not in {cols}")

    i_name = col("HLO op name")
    try:
        i_cat = col("HLO op category")
    except KeyError:
        i_cat = None
    i_self = col("Total self time (us)")
    try:
        i_occ = col("occurrences")
    except KeyError:
        i_occ = None

    parsed = []
    for r in rows:
        c = r["c"]
        parsed.append(
            (
                float(c[i_self]["v"] or 0),
                (c[i_cat]["v"] if i_cat is not None else "?"),
                c[i_name]["v"],
                int(c[i_occ]["v"] or 0) if i_occ is not None else 0,
            )
        )
    parsed.sort(reverse=True)
    total = sum(p[0] for p in parsed)
    print(f"total device self time: {total/1e3:.1f} ms  (cols: {cols})")
    for t, cat, name, occ in parsed[:n_top]:
        print(f"{t/1e3:9.2f} ms  {100*t/total:5.1f}%  x{occ:<4d} [{cat}] {name[:110]}")


if __name__ == "__main__":
    main()
