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
    dtype = sys.argv[3] if len(sys.argv) > 3 else None

    import jax
    import jax.numpy as jnp
    import optax

    import bench
    from equihgnn_tpu import create_model
    from equihgnn_tpu.main import _enable_compile_cache
    from equihgnn_tpu.models.config import ModelConfig

    _enable_compile_cache()  # identical configs skip the long tunnel compiles

    pack_slots = True
    batches, _ = bench._make_batches(pack_slots)
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

    # parse the xplane directly (tensorboard_plugin_profile's converter is
    # incompatible with the installed TF); aggregate the "XLA Ops" line
    import re
    from collections import defaultdict

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(xplane, "rb") as fh:
        xs.ParseFromString(fh.read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        evmeta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            agg = defaultdict(lambda: [0.0, 0])
            cat = defaultdict(float)
            total = 0.0
            for ev in line.events:
                name = evmeta[ev.metadata_id].name
                d = ev.duration_ps / 1e9
                m = re.match(r"%?([a-zA-Z\-_]+)", name)
                cat[m.group(1) if m else "?"] += d
                agg[name][0] += d
                agg[name][1] += 1
                total += d
            n_steps_tr = 3 * len(batches)
            print(f"TOTAL {total:.0f} ms / {n_steps_tr} steps = "
                  f"{total/n_steps_tr:.1f} ms/step")
            for c, t in sorted(cat.items(), key=lambda kv: -kv[1])[:12]:
                print(f"  cat {c:26s} {t/n_steps_tr:8.2f} ms/step "
                      f"{100*t/total:5.1f}%")
            print("top ops:")
            top = sorted(agg.items(), key=lambda kv: -kv[1][0])[:n_top]
            for name, (t, n) in top:
                print(f"  {t/n_steps_tr:7.2f} ms/step x{n:<5d} {name[:120]}")


if __name__ == "__main__":
    main()
