"""Component-level timing of the SE3 encoder at bench shapes (real chip).

Times each sub-module's fwd and fwd+bwd in isolation to attribute the step
time (XLA cost analysis gives FLOPs, not stalls). Sync rule: jitted calls are
serialized on-device; a scalar fetch after the rep loop is the true sync.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from equihgnn_tpu.data.batching import spec_for_samples
from equihgnn_tpu.data.packed import PackedSamples, iter_packed_batches
from equihgnn_tpu.data.synthetic import make_synthetic_dataset
from equihgnn_tpu.nn.se3_transformer import (
    AttentionSE3,
    ConvSE3,
    FeedForwardSE3,
    NormSE3,
    SE3Transformer,
)
from equihgnn_tpu.ops.knn import knn_dense
from equihgnn_tpu.ops.sh import spherical_harmonics

BATCH, HIDDEN = 768, 256


def timeit(fn, *args, reps=10):
    out = fn(*args)
    float(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(jax.tree.leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    samples = make_synthetic_dataset(BATCH, seed=0, num_targets=1)
    spec = spec_for_samples(samples, batch_size=BATCH)
    packed = PackedSamples.from_samples(samples)
    b = next(iter_packed_batches(packed, spec, with_pos=True, pack_slots=True))
    b = jax.tree.map(jnp.asarray, b)
    key = jax.random.PRNGKey(0)
    feats = jax.random.normal(key, (b.num_atoms, HIDDEN)) * 0.3

    enc = SE3Transformer(
        dim=HIDDEN, heads=2, depth=2, dim_head=32, num_degrees=2,
        valid_radius=5.0, num_neighbors=16,
    )
    args = (feats, b.pos, b.atom_graph_id, b.slot_index, b.slot_mask,
            b.atom_slot, b.slot_gid)
    params = jax.jit(enc.init)(key, *args)

    def gradded(mod, margs_rest):
        def inner(p, a0):
            val, grads = jax.value_and_grad(
                lambda pp, aa: jnp.sum(
                    sum(jnp.sum(le) for le in
                        jax.tree.leaves(mod.apply(pp, aa, *margs_rest)))
                ),
                argnums=(0, 1),
            )(p, a0)
            return val + sum(jnp.sum(g) for g in jax.tree.leaves(grads))

        return jax.jit(inner)

    import sys as _sys
    for depth in () if "--mods-only" in _sys.argv else (0, 1, 2):
        e = SE3Transformer(
            dim=HIDDEN, heads=2, depth=depth, dim_head=32, num_degrees=2,
            valid_radius=5.0, num_neighbors=16,
        )
        p = jax.jit(e.init)(key, *args)
        f_fwd = jax.jit(lambda p, f, e=e: jnp.sum(e.apply(p, f, *args[1:])))
        fwd = timeit(f_fwd, p, feats)
        both = timeit(gradded(e, args[1:]), p, feats)
        print(f"encoder depth={depth}:  fwd {fwd:7.1f} ms   fwd+bwd {both:7.1f} ms")

    # shared geometry preamble
    sm = b.slot_mask
    g_, a_ = sm.shape
    gar = jnp.arange(g_)[:, None, None]
    pd = b.pos[b.slot_index] * sm[..., None]
    fd = feats[b.slot_index] * sm[..., None]
    k = min(16, a_ - 1)
    nbr_idx, nbr_mask, sqd = knn_dense(
        pd, sm, k, valid_radius=5.0, squared_radius=False,
        exclude_self=True, slot_gid=b.slot_gid,
    )
    rel_pos = pd[:, :, None, :] - pd[gar, nbr_idx]
    rel_dist = jnp.where(nbr_mask, jnp.sqrt(jnp.maximum(sqd, 0.0)), 0.0)[..., None]
    sh = [jnp.asarray(x) for x in spherical_harmonics(2, rel_pos)]

    def prea(pd):
        ni, nm, sq = knn_dense(pd, sm, k, valid_radius=5.0,
                               squared_radius=False, exclude_self=True,
                               slot_gid=b.slot_gid)
        rp = pd[:, :, None, :] - pd[gar, ni]
        return sum(jnp.sum(x) for x in spherical_harmonics(2, rp))

    print(f"knn+sh preamble:  {timeit(jax.jit(prea), pd):8.1f} ms")

    fib1, fibh = (HIDDEN,), (HIDDEN, HIDDEN)
    x0 = {0: fd[..., None]}
    xh = {0: jax.random.normal(key, (g_, a_, HIDDEN, 1)) * 0.3,
          1: jax.random.normal(key, (g_, a_, HIDDEN, 3)) * 0.3}

    def bench_mod(label, mod, *margs):
        p = jax.jit(mod.init)(key, *margs)
        f = jax.jit(lambda p, a0: sum(
            jnp.sum(le) for le in jax.tree.leaves(mod.apply(p, a0, *margs[1:]))))
        fwd = timeit(f, p, margs[0])
        both = timeit(gradded(mod, margs[1:]), p, margs[0])
        print(f"{label:18s} fwd {fwd:7.1f} ms   fwd+bwd {both:7.1f} ms")

    import sys
    if "--depths-only" in sys.argv:
        return

    # trunk-level shared tensors (same derivation as SE3Transformer.__call__)
    from equihgnn_tpu.nn.se3_transformer import _cg

    cdt = jnp.bfloat16 if "--bf16" in sys.argv else jnp.float32
    xh = {d: t.astype(cdt) for d, t in xh.items()}
    x0 = {0: fd.astype(cdt)[..., None]}
    rel_dist = rel_dist.astype(cdt)
    sh = [t.astype(cdt) for t in sh]
    onehot = (
        (nbr_idx[..., None] == jnp.arange(a_)[None, None, None, :])
        & nbr_mask[..., None]
    ).astype(cdt)
    wsh_map = {}
    for din in range(2):
        for dout in range(2):
            js = list(range(abs(din - dout), din + dout + 1))
            wsh_map[(din, dout)] = jnp.stack(
                [
                    jnp.einsum(
                        "bmc,gakm->gakbc",
                        jnp.asarray(_cg(din, J, dout), dtype=cdt), sh[J],
                    )
                    for J in js
                ],
                axis=3,
            )

    bench_mod("conv_in (pooled)",
              ConvSE3(fib1, fibh), x0, onehot, nbr_mask, rel_dist, wsh_map)
    bench_mod("conv_out (pooled)",
              ConvSE3(fibh, fib1), xh, onehot, nbr_mask, rel_dist, wsh_map)
    bench_mod("to_kv (unpooled)",
              ConvSE3(fibh, (64, 64), pool=False, self_interaction=False,
                      stack=2),
              xh, onehot, nbr_mask, rel_dist, wsh_map)
    bench_mod("attention block",
              AttentionSE3(fibh, dim_head=32, heads=2),
              xh, onehot, nbr_mask, rel_dist, wsh_map)
    bench_mod("ffn block", FeedForwardSE3(fibh), xh)
    bench_mod("norm", NormSE3(fibh), xh)


if __name__ == "__main__":
    main()
