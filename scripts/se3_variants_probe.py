"""A/B probe for the SE3 conv einsum orderings at bench shapes (real chip).

The unpooled (attention to_kv) and pooled conv chains are layout-sensitive:
jnp.einsum output orders that differ from XLA's natural dot output
([batch..., lhs_free..., rhs_free...]) force 3 ms transpose copies of the
~0.4 GB u/M temps (device trace, PERF.md). Each variant here implements the
SAME contraction with a different order/placement of the inevitable
transposes; fwd+bwd wall time picks the winner.

    python scripts/se3_variants_probe.py [--bf16]
"""

import sys
import time

import jax
import jax.numpy as jnp

G, A, K, F = 477, 32, 16, 128
I, O_UN, O_PO = 256, 64, 256
S = 2


def timeit(fn, *args, reps=10):
    out = fn(*args)
    float(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(jax.tree.leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    dt = jnp.bfloat16 if "--bf16" in sys.argv else jnp.float32
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 10)
    # pair (1,1): js={0,1,2} -> J=3, b_in=3, c_out=3, p=J*O_UN
    J, B_IN, C = 3, 3, 3
    P = J * O_UN
    h = jax.random.normal(ks[0], (S, G, A, K, F), dt) * 0.1
    xn = jax.random.normal(ks[1], (G, A, I, B_IN), dt) * 0.1
    W = jax.random.normal(ks[2], (S, F, O_UN, I, J), dt) * 0.02
    wsh = jax.random.normal(ks[3], (G, A, K, J, B_IN, C), dt) * 0.1
    nbr = jax.random.randint(ks[4], (G, A, K), 0, A)
    onehot = (nbr[..., None] == jnp.arange(A)[None, None, None, :]).astype(dt)

    def grad_time(f, *args):
        g = jax.jit(
            jax.grad(lambda *a: jnp.sum(f(*a).astype(jnp.float32)))
        )
        return timeit(g, *args)

    # ---- unpooled chain variants (per full pair: loop over b_in) ----
    def v0(h, xn, W, wsh, onehot):  # current module ordering
        Wp = jnp.moveaxis(W, -1, 2).reshape(S, F, P, I)
        hd = jnp.einsum("gikj,sgikf->sgijf", onehot, h)
        res = 0.0
        for bi in range(B_IN):
            u = jnp.einsum("sfpi,gji->sgjpf", Wp, xn[..., bi])
            v = jnp.einsum("sgajf,sgjpf->sgjap", hd, u)
            vk = jnp.einsum("gakj,sgjap->sgakp", onehot, v)
            ek = vk.reshape(vk.shape[:4] + (J, O_UN))
            res = res + jnp.einsum("sgakJo,gakJc->sgakoc", ek, wsh[..., bi, :])
        return res

    def v1(h, xn, W, wsh, onehot):  # natural orders + one explicit hd transpose
        Wp = jnp.moveaxis(W, -1, 2).reshape(S, F, P, I)
        hdn = jnp.einsum("gikj,sgikf->gijsf", onehot, h)  # natural
        hdT = jnp.transpose(hdn, (0, 2, 3, 1, 4))  # [g, j, s, a, f]
        res = 0.0
        for bi in range(B_IN):
            u = jnp.einsum("gji,sfpi->gjsfp", xn[..., bi], Wp)  # natural
            v = jnp.einsum("gjsaf,gjsfp->gjsap", hdT, u)  # natural
            vT = jnp.transpose(v, (0, 3, 1, 2, 4))  # [g, a, j, s, p]
            vk = jnp.einsum("gakj,gajsp->gaksp", onehot, vT)
            ek = vk.reshape(vk.shape[:4] + (J, O_UN))
            res = res + jnp.einsum("gakSJo,gakJc->Sgakoc", ek, wsh[..., bi, :])
        return res

    def v2(h, xn, W, wsh, onehot):  # natural orders, batched b_in
        Wp = jnp.moveaxis(W, -1, 2).reshape(S, F, P, I)
        hdn = jnp.einsum("gikj,sgikf->gijsf", onehot, h)
        hdT = jnp.transpose(hdn, (0, 2, 3, 1, 4))
        u = jnp.einsum("gjib,sfpi->gjsfpb", xn, Wp)
        v = jnp.einsum("gjsaf,gjsfpb->gjsapb", hdT, u)
        vT = jnp.transpose(v, (0, 3, 1, 2, 4, 5))
        vk = jnp.einsum("gakj,gajspb->gakspb", onehot, vT)
        ek = vk.reshape(vk.shape[:4] + (J, O_UN, B_IN))
        return jnp.einsum("gakSJob,gakJbc->Sgakoc", ek, wsh)

    for name, f in (("v0 current", v0), ("v1 natural+T", v1),
                    ("v2 natural batched-b", v2)):
        fwd = timeit(jax.jit(f), h, xn, W, wsh, onehot)
        bwd = grad_time(f, h, xn, W, wsh, onehot)
        print(f"unpooled {name:22s} fwd {fwd:7.1f} ms   fwd+bwd {bwd:7.1f} ms")

    # ---- pooled chain variants (pair (0,1): J=1, b_in=1, c=3) ----
    Jp, Bp, Cp = 1, 1, 3
    hp = jax.random.normal(ks[5], (1, G, A, K, F), dt) * 0.1
    xp = jax.random.normal(ks[6], (G, A, I, Bp), dt) * 0.1
    Wpo = jax.random.normal(ks[7], (1, F, O_PO, I), dt) * 0.02
    wshp = jax.random.normal(ks[8], (G, A, K, Jp, Bp, Cp), dt) * 0.1

    def p0(h, xn, W, wsh, onehot):  # per-c loop (pre-round-4)
        xg = jnp.einsum("gakj,gjeb->gakeb", onehot, xn)
        tc = jnp.einsum("gakbc,gakib->gakic", wsh[..., 0, :, :], xg)
        per_c = []
        for c in range(Cp):
            M = jnp.einsum("sgakf,gaki->sgaif", h, tc[..., c])
            per_c.append(jnp.einsum("sfoi,sgaif->sgao", W, M))
        return jnp.stack(per_c, axis=-1)

    def p1(h, xn, W, wsh, onehot):  # batched-c, requested orders (current)
        xg = jnp.einsum("gakj,gjeb->gakeb", onehot, xn)
        tc = jnp.einsum("gakbc,gakib->gakci", wsh[..., 0, :, :], xg)
        M = jnp.einsum("sgakf,gakci->sgafci", h, tc)
        return jnp.einsum("sfoi,sgafci->sgaoc", W, M)

    def p2(h, xn, W, wsh, onehot):  # batched-c, natural orders
        xg = jnp.einsum("gakj,gjeb->gakeb", onehot, xn)
        tc = jnp.einsum("gakbc,gakib->gakci", wsh[..., 0, :, :], xg)
        tc2 = tc.reshape(G, A, K, Cp * I)
        M = jnp.einsum("sgakf,gakq->gasfq", h, tc2)  # natural
        M6 = M.reshape(G, A, 1, F, Cp, I)
        out = jnp.einsum("sfoi,gasfci->sogac", W, M6)  # natural
        return jnp.transpose(out, (0, 2, 3, 1, 4))

    for name, f in (("p0 per-c", p0), ("p1 batched-c", p1),
                    ("p2 natural", p2)):
        fwd = timeit(jax.jit(f), hp, xp, Wpo, wshp, onehot)
        bwd = grad_time(f, hp, xp, Wpo, wshp, onehot)
        print(f"pooled   {name:22s} fwd {fwd:7.1f} ms   fwd+bwd {bwd:7.1f} ms")


if __name__ == "__main__":
    main()
