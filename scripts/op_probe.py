"""Micro-probes of suspected hot ops on the real TPU (run when idle).

    python scripts/op_probe.py
"""

import json
import time

import numpy as np


def timeit(fn, *args, reps=50):
    out = fn(*args)
    float(np.asarray(out).ravel()[0])  # sync
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(np.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    results = {}

    # batched 3x3 eigh at FAFormer's per-step shape (EdgeModule local frames)
    x = rng.standard_normal((769 * 32, 16, 3)).astype(np.float32)
    cov = np.einsum("bpi,bpj->bij", x, x)
    cov_j = jnp.asarray(cov)
    eigh = jax.jit(lambda c: jnp.linalg.eigh(c)[1])
    results["eigh_24k_3x3_ms"] = round(timeit(eigh, cov_j) * 1e3, 2)

    # the coord MLP matmul of EdgeModule, for scale
    h = jnp.asarray(rng.standard_normal((769, 32, 8, 16, 256)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((256, 256)).astype(np.float32))
    mm = jax.jit(lambda a, b: a @ b)
    results["edgemodule_fc2_matmul_ms"] = round(timeit(mm, h, w, reps=20) * 1e3, 2)

    # visnet suspects: the [G,A,k,A,L] od einsum vs plain edge MLP
    oh = jnp.asarray((rng.random((539, 32, 17, 32)) < 0.05).astype(np.float32))
    dij = jnp.asarray(rng.standard_normal((539, 32, 17, 8)).astype(np.float32))
    vv = jnp.asarray(rng.standard_normal((539, 32, 8, 256)).astype(np.float32))
    od_path = jax.jit(
        lambda o, d, v: jnp.einsum(
            "gikjl,gjlh->gikh",
            jnp.einsum("gikj,gikl->gikjl", o, d), v,
        )
    )
    results["visnet_od_einsum_ms"] = round(timeit(od_path, oh, dij, vv, reps=20) * 1e3, 2)

    f_ij = jnp.asarray(rng.standard_normal((539, 32, 17, 256)).astype(np.float32))
    w2 = jnp.asarray(rng.standard_normal((256, 512)).astype(np.float32))
    results["visnet_edge_mlp_ms"] = round(timeit(mm, f_ij, w2, reps=20) * 1e3, 2)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
