"""First thing to run after a TPU outage: numeric sanity of the Pallas
kernels on the REAL backend (the CPU test suite exercises interpret mode
only — Mosaic lowering is only validated here).

    python scripts/tpu_kernel_sanity.py

Checks pooled_m and fused_frame_swiglu (fwd + grads, plus in-kernel dropout
determinism, which has no CPU path at all) against their pure-XLA
references at bench-like shapes, then the edge-MLP and segment-sum kernels'
module tests via their own references. Prints one PASS/FAIL line per check.

Axon discipline: one TPU client at a time; never kill mid-work.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOL = 2e-4


def check(name, got, want, tol=TOL):
    err = float(np.max(np.abs(np.asarray(got) - np.asarray(want))))
    denom = float(np.max(np.abs(np.asarray(want)))) or 1.0
    ok = err / denom < tol
    print(f"{'PASS' if ok else 'FAIL'} {name}: rel_err={err / denom:.2e}")
    return ok


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), jax.devices()[0])
    # f32 checks run under HIGHEST matmul precision: at the TPU default,
    # kernel and XLA reference each independently round their MXU passes to
    # bf16, producing equally-accurate results ~3e-3 apart (both are ~3e-7
    # from a float64 oracle under HIGHEST — measured 2026-08-18). Highest
    # precision removes that rounding so the comparison isolates Mosaic
    # lowering correctness; the bf16 checks below keep the realistic mode.
    ctx = jax.default_matmul_precision("highest")
    ctx.__enter__()
    oks = []

    # ---------------------------------------------------------- pooled_m
    from equihgnn_tpu.ops.pallas.pooled_m import pooled_m

    def pm_ref(h, tc):
        return jnp.einsum(
            "gakf,gakx->gaxf", h.astype(jnp.float32), tc.astype(jnp.float32)
        )

    rng = np.random.default_rng(0)
    g, a, k, f, x = 4, 194, 16, 128, 9  # bench-like (a not a multiple of 8)
    h = jnp.asarray(rng.standard_normal((g, a, k, f)), jnp.float32)
    tc = jnp.asarray(rng.standard_normal((g, a, k, x)), jnp.float32)
    oks.append(check("pooled_m fwd", jax.jit(pooled_m)(h, tc), pm_ref(h, tc)))

    def loss(fn):
        return lambda h, tc: jnp.sum(jnp.sin(fn(h, tc)))

    gh, gt = jax.jit(jax.grad(loss(pooled_m), argnums=(0, 1)))(h, tc)
    rh, rt = jax.jit(jax.grad(loss(pm_ref), argnums=(0, 1)))(h, tc)
    oks.append(check("pooled_m grad h", gh, rh))
    oks.append(check("pooled_m grad tc", gt, rt))

    hb = h.astype(jnp.bfloat16)
    tb = tc.astype(jnp.bfloat16)
    # bf16 inputs must run at DEFAULT precision: Mosaic rejects a bf16×bf16
    # tpu.matmul carrying contract_precision=fp32 ("Bad lhs type").
    with jax.default_matmul_precision("default"):
        outb = jax.jit(pooled_m)(hb, tb)
    assert outb.dtype == jnp.bfloat16  # emitted in input dtype
    oks.append(
        check("pooled_m bf16 fwd", outb.astype(jnp.float32), pm_ref(hb, tb),
              tol=2e-2)
    )

    # --------------------------------------------------- fused_frame_swiglu
    from equihgnn_tpu.nn.faformer import _SIGN_OPS
    from equihgnn_tpu.ops.pallas.frame_swiglu import fused_frame_swiglu

    def fs_ref(x, w1, b1, ls, lb):
        c = x.shape[1]
        sgn = jnp.concatenate(
            [jnp.asarray(_SIGN_OPS, jnp.float32),
             jnp.ones((8, c - 3), jnp.float32)], axis=1
        )
        pre = jnp.einsum("oc,pc,ch->poh", sgn, x, w1) + b1
        hh = w1.shape[1] // 2
        y = jax.nn.silu(pre[..., :hh]) * pre[..., hh:]
        mu = y.mean(-1, keepdims=True)
        d = y - mu
        z = d * jax.lax.rsqrt((d * d).mean(-1, keepdims=True) + 1e-5)
        return (z * ls + lb).mean(1)

    p, c, hdim = 7321, 6, 256
    xx = jnp.asarray(rng.standard_normal((p, c)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((c, hdim)) * 0.3, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(hdim) * 0.1, jnp.float32)
    ls = jnp.asarray(rng.standard_normal(hdim // 2) * 0.5 + 1.0, jnp.float32)
    lb = jnp.asarray(rng.standard_normal(hdim // 2) * 0.1, jnp.float32)
    args = (xx, w1, b1, ls, lb)
    oks.append(
        check("frame_swiglu fwd", jax.jit(fused_frame_swiglu)(*args),
              fs_ref(*args))
    )

    def l2(fn, *a):
        return jnp.sum(jnp.cos(fn(*a)))

    gk = jax.jit(jax.grad(lambda *a: l2(fused_frame_swiglu, *a),
                          argnums=(0, 1, 2, 3, 4)))(*args)
    gr = jax.jit(jax.grad(lambda *a: l2(fs_ref, *a),
                          argnums=(0, 1, 2, 3, 4)))(*args)
    for nm, a_, b_ in zip(("dx", "dw1", "db1", "dls", "dlb"), gk, gr):
        oks.append(check(f"frame_swiglu grad {nm}", a_, b_))

    # C == 3 (no frame-invariant tail — FAFormer's coord MLP shape): the
    # backward must not emit zero-size m[3:]/g[:, 3:] slices under Mosaic
    x3 = xx[:, :3]
    w3 = w1[:3]
    a3 = (x3, w3, b1, ls, lb)
    oks.append(
        check("frame_swiglu c=3 fwd", jax.jit(fused_frame_swiglu)(*a3),
              fs_ref(*a3))
    )
    gk3 = jax.jit(jax.grad(lambda *a: l2(fused_frame_swiglu, *a),
                           argnums=(0, 1)))(*a3)
    gr3 = jax.jit(jax.grad(lambda *a: l2(fs_ref, *a),
                           argnums=(0, 1)))(*a3)
    for nm, a_, b_ in zip(("dx", "dw1"), gk3, gr3):
        oks.append(check(f"frame_swiglu c=3 grad {nm}", a_, b_))

    # dropout determinism (TPU-only path): same seed → same output; the
    # backward regenerates the identical mask (grad nonzero iff kept)
    if jax.default_backend() == "tpu":
        seed = jnp.int32(1234)
        f1 = jax.jit(
            lambda *a: fused_frame_swiglu(*a, drop_rate=0.25, seed=seed)
        )
        o1, o2 = f1(*args), f1(*args)
        oks.append(check("frame_swiglu dropout deterministic", o1, o2, 1e-7))
        gdrop = jax.jit(
            jax.grad(
                lambda *a: jnp.sum(
                    fused_frame_swiglu(*a, drop_rate=0.25, seed=seed)
                )
            )
        )(*args)
        finite = bool(np.all(np.isfinite(np.asarray(gdrop))))
        print(f"{'PASS' if finite else 'FAIL'} frame_swiglu dropout grad finite")
        oks.append(finite)
        # fwd/bwd dropout-mask AGREEMENT: the backward regenerates the mask
        # from (seed, program_id); if it desyncs from the forward draw, the
        # analytic directional derivative diverges from the central finite
        # difference (the mask is shape+seed-deterministic, so x ± eps·v see
        # the identical mask). Untestable off-TPU (no prng_seed lowering).
        vdir = jnp.asarray(
            np.random.default_rng(7).standard_normal(xx.shape), jnp.float32
        )
        fdrop = jax.jit(
            lambda x_: jnp.sum(
                fused_frame_swiglu(x_, w1, b1, ls, lb,
                                   drop_rate=0.25, seed=seed)
            )
        )
        eps = 1e-3
        fd = (float(fdrop(xx + eps * vdir)) - float(fdrop(xx - eps * vdir))
              ) / (2 * eps)
        analytic = float(jnp.vdot(gdrop, vdir))
        oks.append(
            check("frame_swiglu dropout fwd/bwd mask agreement",
                  np.float64(analytic), np.float64(fd), tol=5e-3)
        )

    # ------------------------------------------------------------- edge_mlp
    from equihgnn_tpu.ops.pallas import edge_mlp as em

    g2, a2, f2, k2, m2 = 3, 32, 64, 8, 48
    ui = jnp.asarray(rng.standard_normal((g2, a2, f2)), jnp.float32)
    ujn = jnp.asarray(rng.standard_normal((g2, a2, f2)), jnp.float32)
    dist = jnp.asarray(rng.standard_normal((g2, a2, k2)) ** 2, jnp.float32)
    idx = jnp.asarray(rng.integers(0, a2, (g2, a2, k2)), jnp.int32)
    wd = jnp.asarray(rng.standard_normal(f2) * 0.2, jnp.float32)
    b0 = jnp.asarray(rng.standard_normal(f2) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((f2, m2)) * 0.2, jnp.float32)
    b1m = jnp.asarray(rng.standard_normal(m2) * 0.1, jnp.float32)
    eargs = (ui, ujn, dist, idx, wd, b0, w1, b1m)
    assert em._supported(a2, k2, f2, m2)
    oks.append(
        check("edge_mlp fwd", jax.jit(em._fused)(*eargs),
              em._xla_forward(*eargs))
    )

    def el(fn, *a):
        return jnp.sum(jnp.sin(fn(*a)))

    ge = jax.jit(jax.grad(lambda *a: el(em._fused, *a),
                          argnums=(0, 1, 2, 4, 5, 6, 7)))(*eargs)
    gre = jax.jit(jax.grad(lambda *a: el(em._xla_forward, *a),
                           argnums=(0, 1, 2, 4, 5, 6, 7)))(*eargs)
    for nm, a_, b_ in zip(
        ("dui", "dujn", "ddist", "dwd", "db0", "dw1", "db1"), ge, gre
    ):
        oks.append(check(f"edge_mlp grad {nm}", a_, b_))

    # -------------------------------------------------------------- vis_mix
    from equihgnn_tpu.ops.pallas import vis_mix as vm

    g, a, k, L, h = 6, 32, 17, 8, 256  # bench shapes
    # PRODUCTION dtype: the kernel is sub-f32-gated (bf16 I/O halves its
    # VMEM blocks — f32 I/O at these shapes exceeds the 16 MB scoped limit);
    # the f32 reference computes on the same bf16-quantized values
    bq = lambda x: jnp.asarray(x, jnp.float32).astype(jnp.bfloat16)  # noqa: E731
    vec = bq(rng.standard_normal((g, a, L, h)))
    s1 = bq(rng.standard_normal((g, a, k, h)) * 0.3)
    s2m = bq(rng.standard_normal((g, a, k, h)) * 0.3)
    dsh = bq(rng.standard_normal((g, a, k, L)) * 0.5)
    vidx = jnp.asarray(rng.integers(0, a, (g, a, k)), jnp.int32)
    vmask = jnp.asarray(rng.random((g, a, k)) > 0.2)
    vu = bq(rng.standard_normal((g, a, L, h)) * 0.3)
    vvv = bq(rng.standard_normal((g, a, L, h)) * 0.3)
    f32 = lambda t: t.astype(jnp.float32)  # noqa: E731
    va_k, wd_k = jax.jit(vm._mix_edge)(vec, s1, s2m, dsh, vidx, vmask, vu, vvv)
    va_r, wd_r = vm._xla_mix(f32(vec), f32(s1), f32(s2m), f32(dsh), vidx,
                             vmask, f32(vu), f32(vvv))
    # vis_mix runs bf16 MXU operands (sub-f32-gated kernel): compare
    # at bf16 tolerance, not the f32-HIGHEST tolerance of the other checks
    oks.append(check("vis_mix fwd vec_agg", va_k, va_r, 2e-2))
    oks.append(check("vis_mix fwd w_dot", wd_k, wd_r, 2e-2))
    r1 = jnp.asarray(rng.standard_normal(vec.shape), jnp.float32)
    r2 = jnp.asarray(rng.standard_normal(s1.shape), jnp.float32)

    def vl(fn, *args):
        va_, wd_ = fn(*args)
        return (jnp.sum(va_.astype(jnp.float32) * r1)
                + jnp.sum(wd_.astype(jnp.float32) * r2))

    gv = jax.jit(jax.grad(lambda *ar: vl(vm._mix_edge, *ar),
                          argnums=(0, 1, 2, 3, 6, 7)))(
        vec, s1, s2m, dsh, vidx, vmask, vu, vvv)
    grv = jax.jit(jax.grad(lambda *ar: vl(vm._xla_mix, *ar),
                           argnums=(0, 1, 2, 3, 6, 7)))(
        f32(vec), f32(s1), f32(s2m), f32(dsh), vidx, vmask, f32(vu), f32(vvv))
    for nm, a_, b_ in zip(("dvec", "ds1", "ds2m", "dd", "du", "dvv"), gv, grv):
        oks.append(check(f"vis_mix grad {nm}", a_, b_, 2e-2))
    va_k2 = jax.jit(vm._mix_last)(vec, s1, s2m, dsh, vidx, vmask)
    va_r2, _ = vm._xla_mix(f32(vec), f32(s1), f32(s2m), f32(dsh), vidx, vmask)
    oks.append(check("vis_mix last fwd", va_k2, va_r2, 2e-2))

    # ----------------------------------------------------------- segment_sum
    from equihgnn_tpu.ops.pallas.segment_sum import sorted_segment_sum

    nnz, ns, d = 4096, 512, 256
    seg = jnp.sort(jnp.asarray(rng.integers(0, ns, nnz), jnp.int32))
    vals = jnp.asarray(rng.standard_normal((nnz, d)), jnp.float32)
    got = jax.jit(lambda v, s: sorted_segment_sum(v, s, ns))(vals, seg)
    want = jax.ops.segment_sum(vals, seg, num_segments=ns)
    oks.append(check("sorted_segment_sum fwd", got, want))

    print("ALL PASS" if all(oks) else "SOME FAILED", f"({sum(oks)}/{len(oks)})")
    return 0 if all(oks) else 1


if __name__ == "__main__":
    raise SystemExit(main())
