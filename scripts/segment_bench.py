"""Isolated segment-reduce micro-benchmark on the real TPU (VERDICT r1 #6).

Compares, at the hypergraph hot-op shapes (batch 768 QM9-like):
  * hyperedge direction (sorted ids): XLA scatter vs Pallas sorted-segment kernel
  * vertex direction (unsorted ids): XLA scatter vs sort-once-then-Pallas
    (permutation precomputed host-side, gather + kernel on device)

Prints one JSON line per variant; keep whichever wins (the loser stays
available behind `masked_segment_reduce`).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from equihgnn_tpu.data.batching import spec_for_samples
    from equihgnn_tpu.data.packed import PackedSamples, iter_packed_batches
    from equihgnn_tpu.data.synthetic import make_synthetic_dataset
    from equihgnn_tpu.ops.pallas.segment_sum import sorted_segment_sum

    samples = make_synthetic_dataset(2 * 768, seed=0, num_targets=1)
    spec = spec_for_samples(samples, batch_size=768)
    packed = PackedSamples.from_samples(samples)
    b = next(iter(iter_packed_batches(packed, spec, target=0, with_pos=True)))
    d = 256
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.standard_normal((spec.nnz, d)).astype(np.float32))
    hedge_idx = jnp.asarray(b.hedge_idx)
    vertex_idx = jnp.asarray(b.vertex_idx)
    # host-side sort of the vertex direction (would be emitted by the packer)
    perm = np.argsort(np.asarray(b.vertex_idx), kind="stable")
    perm_j = jnp.asarray(perm)
    v_sorted = jnp.asarray(np.asarray(b.vertex_idx)[perm])

    E, N = spec.num_hedges, spec.num_atoms

    fns = {
        "hedge_xla": jax.jit(
            lambda x: jax.ops.segment_sum(
                x, hedge_idx, num_segments=E, indices_are_sorted=True
            )
        ),
        "hedge_pallas": jax.jit(lambda x: sorted_segment_sum(x, hedge_idx, E)),
        "vertex_xla": jax.jit(
            lambda x: jax.ops.segment_sum(x, vertex_idx, num_segments=N)
        ),
        "vertex_sort_pallas": jax.jit(
            lambda x: sorted_segment_sum(x[perm_j], v_sorted, N)
        ),
    }

    ref = {}
    for name, fn in fns.items():
        out = fn(data)
        ref[name.split("_")[0]] = np.asarray(out)

    np.testing.assert_allclose(
        ref["hedge"], np.asarray(fns["hedge_pallas"](data)), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        ref["vertex"], np.asarray(fns["vertex_sort_pallas"](data)),
        rtol=2e-5, atol=2e-5,
    )

    reps = 300
    for name, fn in fns.items():
        out = fn(data)
        float(out.sum())  # sync
        t0 = time.perf_counter()
        o = None
        for _ in range(reps):
            o = fn(data)
        float(o.sum())  # single true sync (axon: block_until_ready is a no-op)
        dt = (time.perf_counter() - t0) / reps
        gb = (data.size + o.size) * 4 / 1e9
        print(json.dumps({
            "op": name, "us_per_call": round(dt * 1e6, 1),
            "effective_GBps": round(gb / dt, 1),
        }))


if __name__ == "__main__":
    main()
