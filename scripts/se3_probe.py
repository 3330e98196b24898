"""Probe the SE3 hot einsums on the real chip: f32 vs bf16 inputs, batched-J
vs per-J loops. Informs the round-3 SE3 optimization (PERF.md).

Axon-tunnel measurement rule (see bench.py docstring): block_until_ready does
not synchronize, so each op is chained N times with a data dependency inside
one jitted function and timed around a scalar fetch (a true sync).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

G, A, K = 768, 32, 17
GA = G * A
F, I, O = 128, 256, 256
OA = 64  # attention conv nc_out
N = 30


def timeit(fn, *args):
    """fn(*args) -> array; chained N deps inside jit; returns ms/call."""

    def chained(*a):
        out = fn(*a)
        s = jnp.sum(out)
        for _ in range(N - 1):
            a2 = (a[0] + s * 1e-30,) + a[1:]
            out = fn(*a2)
            s = jnp.sum(out)
        return s

    cf = jax.jit(chained)
    float(cf(*args))  # compile + warm
    t0 = time.perf_counter()
    float(cf(*args))
    return (time.perf_counter() - t0) / N * 1e3


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)

    # 1) pooled-conv W apply: [GA, F*I] x [F*I, O]
    M = jnp.asarray(rng.standard_normal((GA, F * I)).astype(np.float32))
    W = jnp.asarray(rng.standard_normal((F * I, O)).astype(np.float32))
    fl = 2 * GA * F * I * O
    t = timeit(lambda a, b: a @ b, M, W)
    print(f"W-apply f32 default: {t:.3f} ms  {fl/t/1e9:.1f} TF/s")
    t = timeit(
        lambda a, b: jax.lax.dot(a, b, precision=jax.lax.Precision.HIGHEST), M, W
    )
    print(f"W-apply f32 HIGHEST: {t:.3f} ms  {fl/t/1e9:.1f} TF/s")
    t = timeit(
        lambda a, b: jax.lax.dot(
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ),
        M, W,
    )
    print(f"W-apply bf16 in/f32 acc: {t:.3f} ms  {fl/t/1e9:.1f} TF/s")

    # 2) attention-conv u einsum per J: "foi,gjib->gjfob", b=3
    B = 3
    Wf = jnp.asarray(rng.standard_normal((F, OA, I)).astype(np.float32))
    xn = jnp.asarray(rng.standard_normal((G, A, I, B)).astype(np.float32))
    flu = 2 * G * A * F * OA * I * B
    t = timeit(lambda w, x: jnp.einsum("foi,gjib->gjfob", w, x), Wf, xn)
    print(f"u-einsum f32: {t:.3f} ms  {flu/t/1e9:.1f} TF/s")
    t = timeit(
        lambda w, x: jnp.einsum(
            "foi,gjib->gjfob",
            w.astype(jnp.bfloat16), x.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ),
        Wf, xn,
    )
    print(f"u-einsum bf16: {t:.3f} ms  {flu/t/1e9:.1f} TF/s")

    # batched over 3 Js in one einsum vs a loop
    WfJ = jnp.asarray(rng.standard_normal((3, F, OA, I)).astype(np.float32))
    fluJ = 3 * flu
    t = timeit(lambda w, x: jnp.einsum("Jfoi,gjib->gjJfob", w, x), WfJ, xn)
    print(f"uJ-einsum f32 (3J batched): {t:.3f} ms  {fluJ/t/1e9:.1f} TF/s")
    t = timeit(
        lambda w, x: jnp.einsum(
            "Jfoi,gjib->gjJfob",
            w.astype(jnp.bfloat16), x.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ),
        WfJ, xn,
    )
    print(f"uJ-einsum bf16 (3J batched): {t:.3f} ms  {fluJ/t/1e9:.1f} TF/s")
    t = timeit(
        lambda w, x: sum(
            jnp.einsum("foi,gjib->gjfob", w[j], x) for j in range(3)
        ),
        WfJ, xn,
    )
    print(f"uJ-einsum f32 (3J loop): {t:.3f} ms  {fluJ/t/1e9:.1f} TF/s")

    # 3) v_dense mix: "gijf,gjfob->gijob"
    hd = jnp.asarray(rng.standard_normal((G, A, A, F)).astype(np.float32))
    u = jnp.asarray(rng.standard_normal((G, A, F, OA, B)).astype(np.float32))
    flv = 2 * G * A * A * F * OA * B
    t = timeit(lambda a, b: jnp.einsum("gijf,gjfob->gijob", a, b), hd, u)
    print(f"v-dense f32: {t:.3f} ms  {flv/t/1e9:.1f} TF/s")
    t = timeit(
        lambda a, b: jnp.einsum(
            "gijf,gjfob->gijob",
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ),
        hd, u,
    )
    print(f"v-dense bf16: {t:.3f} ms  {flv/t/1e9:.1f} TF/s")

    # 4) M einsum (pooled): "gakf,gaki->gafi"  contraction k=17
    h = jnp.asarray(rng.standard_normal((G, A, K, F)).astype(np.float32))
    tc = jnp.asarray(rng.standard_normal((G, A, K, I)).astype(np.float32))
    flm = 2 * G * A * K * F * I
    t = timeit(lambda a, b: jnp.einsum("gakf,gaki->gafi", a, b), h, tc)
    print(f"M-einsum f32 (K=17): {t:.3f} ms  {flm/t/1e9:.1f} TF/s")
    t = timeit(
        lambda a, b: jnp.einsum(
            "gakf,gaki->gafi",
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ),
        h, tc,
    )
    print(f"M-einsum bf16 (K=17): {t:.3f} ms  {flm/t/1e9:.1f} TF/s")


if __name__ == "__main__":
    main()
