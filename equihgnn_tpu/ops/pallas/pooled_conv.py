"""Pallas TPU kernel: fully-fused pooled ConvSE3 unit (M-build + projection).

The pooled TFN path (`nn/se3_transformer.py` `_ConvSE3Pair`, reference
`se3_transformer_layer.py:187-308`) computes, per (din→dout) pair and
Clebsch-Gordan block J:

    M[g, a, c, i, f] = Σ_k h[g, a, k, f] · tc[g, a, k, c, i]     (k = 16)
    out[g, a, o, c]  = Σ_{i,f} W[f, o, i] · M[g, a, c, i, f]

Two chained contractions: XLA cannot fuse dot-into-dot, so M — the model's
largest temp (3 GB at fiber 256 / batch 768 for a c=3 pair) — round-trips
HBM once forward, once in the checkpoint replay, and once more as dM. The
round-3 `pooled_m` kernel fixed the *compute* of the K=16 M-build but still
emitted M to HBM; the device trace (round 4) shows the M write/read plus
two full 3 GB layout copies around it per pair-J. At 819 GB/s those bytes
are the SE3 step's single biggest cost block (~150 GB/step across both
trunk convs, ROOFLINE.json).

This kernel keeps the whole unit in VMEM (v5e: 128 MB, probed):

  * W — prepared by the caller as W4[I/S, S·F, O] (one contiguous reshape
    of W^T[i, f, o]) — is a grid-constant block, fetched once;
  * per g-block, the M rows for gb·A sites are built with one MXU dot per
    site ([C·I, K]×[K, F], the `pooled_m` recipe) into a VMEM scratch;
  * the projection runs as I/S chunked [R, S·F]×[S·F, O] dots with f32
    accumulation — K = S·F = 512, full systolic depth;
  * the backward kernel recomputes M in VMEM (nothing large is saved),
    emits dh/dtc per block and accumulates dW in a f32 VMEM buffer across
    the whole grid — so neither M nor dM ever exists in HBM.

HBM traffic per pair-J drops from ~18 GB (M fwd + replay + dM, measured
trace) to the irreducible operands: h + tc reads, out/dh/dtc writes, W
once (~1 GB). Forward-only callers (eval) hit `_fwd` via the custom-VJP
fast path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VMEM_LIMIT = 110 * 2**20
_ISPLIT = 4  # I-chunk width of the projection dots: K = _ISPLIT * F


def _dot(a, b, dims):
    return jax.lax.dot_general(
        a, b, (dims, ((), ())), preferred_element_type=jnp.float32
    )


_VMEM_BUDGET = 96 * 2**20  # headroom under VMEM_LIMIT for compiler slack


def _bwd_vmem(gb, a, k, c, i, f, o, isz):
    """Worst-case (backward) VMEM bytes: double-buffered in/out blocks +
    w4 + m2/dm2 scratch + f32 dW accumulator."""
    r = gb * a * c
    ic, ch = i // _ISPLIT, _ISPLIT * f
    h_b = gb * a * k * f * isz
    tc_b = gb * a * k * c * i * isz
    do_b = r * o * isz
    dbuf = 2 * (2 * h_b + 2 * tc_b + 2 * do_b)  # h,dh,tc,dtc,do (+fwd out)
    w4 = ic * ch * o * isz
    dw4 = ic * ch * o * isz
    scratch = 2 * r * ic * ch * isz + ic * ch * o * 4
    return dbuf + w4 + dw4 + scratch + r * o * 4


def _gb_g(a, k, c, i, f, o, isz):
    """Largest graphs-per-block (≤256 projection rows) that fits VMEM."""
    for gb in range(max(1, 256 // (a * c)), 0, -1):
        if _bwd_vmem(gb, a, k, c, i, f, o, isz) < _VMEM_BUDGET:
            return gb
    return 0


def pooled_conv_supported(a, k, c, i, f, o, dtype) -> bool:
    """Static gate: shape divisibility + total VMEM for fwd AND bwd."""
    if i % _ISPLIT or f % 8 or o % 128:
        return False
    return _gb_g(a, k, c, i, f, o, jnp.dtype(dtype).itemsize) > 0


def _m2_rows(h_ref, tc_ref, m2_ref, gb, a_, c_, ic, ch):
    """Build M rows for every site of the block into the [IC, R, CH] m2
    scratch (chunk-major so the projection dots read contiguous slabs)."""
    for g in range(gb):
        for ai in range(a_):
            # [C·I, F] = Σ_k tc[k, ci] · h[k, f], f32 MXU accumulation
            m = _dot(tc_ref[g, ai], h_ref[g, ai], ((0,), (0,)))
            r0 = (g * a_ + ai) * c_
            m2_ref[:, r0 : r0 + c_, :] = jnp.swapaxes(
                m.reshape(c_, ic, ch), 0, 1
            ).astype(m2_ref.dtype)


def _fwd_kernel(h_ref, tc_ref, w_ref, o_ref, m2_ref, *, gb, c_):
    a_ = h_ref.shape[1]
    ic, ch = w_ref.shape[0], w_ref.shape[1]
    o_dim = w_ref.shape[2]
    r = gb * a_ * c_
    _m2_rows(h_ref, tc_ref, m2_ref, gb, a_, c_, ic, ch)

    def body(i, acc):
        return acc + _dot(m2_ref[i], w_ref[i], ((1,), (0,)))

    acc = jax.lax.fori_loop(
        0, ic, body, jnp.zeros((r, o_dim), jnp.float32)
    )
    o_ref[...] = acc.reshape(gb, a_, c_, o_dim).astype(o_ref.dtype)


def _bwd_kernel(
    h_ref, tc_ref, w_ref, do_ref, dh_ref, dtc_ref, dw_ref,
    m2_ref, dm2_ref, dwacc_ref, *, gb, c_,
):
    a_ = h_ref.shape[1]
    ic, ch = w_ref.shape[0], w_ref.shape[1]
    r = gb * a_ * c_
    _m2_rows(h_ref, tc_ref, m2_ref, gb, a_, c_, ic, ch)
    do = do_ref[...].reshape(r, do_ref.shape[-1])

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwacc_ref[...] = jnp.zeros_like(dwacc_ref)

    def body(i, _):
        # dW[i] += m2[i]^T · dout   ([CH, R]×[R, O])
        dwacc_ref[i] += _dot(m2_ref[i], do, ((0,), (0,)))
        # dm2[i] = dout · W[i]^T    ([R, O]×[O, CH])
        dm2_ref[i] = _dot(do, w_ref[i], ((1,), (1,))).astype(dm2_ref.dtype)
        return 0

    jax.lax.fori_loop(0, ic, body, 0)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _emit():
        dw_ref[...] = dwacc_ref[...].astype(dw_ref.dtype)

    f_ = h_ref.shape[-1]
    x_ = tc_ref.shape[-1]
    for g in range(gb):
        for ai in range(a_):
            r0 = (g * a_ + ai) * c_
            dm = jnp.swapaxes(dm2_ref[:, r0 : r0 + c_, :], 0, 1).reshape(
                x_, f_
            )
            # dh[k, f] = Σ_x tc[k, x] · dM[x, f]
            dh_ref[g, ai] = _dot(
                tc_ref[g, ai], dm, ((1,), (0,))
            ).astype(dh_ref.dtype)
            # dtc[k, x] = Σ_f h[k, f] · dM[x, f]
            dtc_ref[g, ai] = _dot(
                h_ref[g, ai], dm, ((1,), (1,))
            ).astype(dtc_ref.dtype)


def _pad_g(t, pad):
    return jnp.pad(t, ((0, pad),) + ((0, 0),) * (t.ndim - 1)) if pad else t


def _grid_args(h, tc, c, o_dim):
    g, a, k, f = h.shape
    x = tc.shape[-1]
    i = x // c
    gb = _gb_g(a, k, c, i, f, o_dim, jnp.dtype(h.dtype).itemsize)
    pad = (-g) % gb
    ic, ch = i // _ISPLIT, _ISPLIT * f
    return g, a, k, f, x, i, gb, pad, ic, ch


def _block_specs(a, k, f, x, gb, ic, ch, o_dim, c):
    h_spec = pl.BlockSpec((gb, a, k, f), lambda n: (n, 0, 0, 0))
    tc_spec = pl.BlockSpec((gb, a, k, x), lambda n: (n, 0, 0, 0))
    w_spec = pl.BlockSpec((ic, ch, o_dim), lambda n: (0, 0, 0))
    out_spec = pl.BlockSpec((gb, a, c, o_dim), lambda n: (n, 0, 0, 0))
    return h_spec, tc_spec, w_spec, out_spec


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(3,))
def _pooled_conv(h, tc, w4, c):
    out, _ = _pc_fwd(h, tc, w4, c)
    return out


def _pc_fwd(h, tc, w4, c):
    from functools import partial

    o_dim = w4.shape[-1]
    g, a, k, f, x, i, gb, pad, ic, ch = _grid_args(h, tc, c, o_dim)
    hp, tp = _pad_g(h, pad), _pad_g(tc, pad)
    h_s, tc_s, w_s, o_s = _block_specs(a, k, f, x, gb, ic, ch, o_dim, c)
    r = gb * a * c
    out = pl.pallas_call(
        partial(_fwd_kernel, gb=gb, c_=c),
        grid=((g + pad) // gb,),
        in_specs=[h_s, tc_s, w_s],
        out_specs=o_s,
        out_shape=jax.ShapeDtypeStruct((g + pad, a, c, o_dim), h.dtype),
        scratch_shapes=[pltpu.VMEM((ic, r, ch), h.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * g * a * (k * x * f + c * i * f * o_dim),
            bytes_accessed=(
                h.size * h.dtype.itemsize
                + tc.size * tc.dtype.itemsize
                + w4.size * w4.dtype.itemsize
                + g * a * c * o_dim * h.dtype.itemsize
            ),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=jax.default_backend() != "tpu",
    )(hp, tp, w4)
    return out[:g], (h, tc, w4)


def _pc_bwd(c, res, dout):
    from functools import partial

    h, tc, w4 = res
    o_dim = w4.shape[-1]
    g, a, k, f, x, i, gb, pad, ic, ch = _grid_args(h, tc, c, o_dim)
    hp, tp = _pad_g(h, pad), _pad_g(tc, pad)
    dop = _pad_g(dout, pad)
    h_s, tc_s, w_s, o_s = _block_specs(a, k, f, x, gb, ic, ch, o_dim, c)
    r = gb * a * c
    dh, dtc, dw4 = pl.pallas_call(
        partial(_bwd_kernel, gb=gb, c_=c),
        grid=((g + pad) // gb,),
        in_specs=[h_s, tc_s, w_s, o_s],
        out_specs=[
            h_s,
            tc_s,
            pl.BlockSpec((ic, ch, o_dim), lambda n: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g + pad, a, k, f), h.dtype),
            jax.ShapeDtypeStruct((g + pad, a, k, x), tc.dtype),
            jax.ShapeDtypeStruct((ic, ch, o_dim), w4.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((ic, r, ch), h.dtype),
            pltpu.VMEM((ic, r, ch), h.dtype),
            pltpu.VMEM((ic, ch, o_dim), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * g * a * (2 * k * x * f + 2 * c * i * f * o_dim),
            bytes_accessed=(
                2 * h.size * h.dtype.itemsize
                + 2 * tc.size * tc.dtype.itemsize
                + 2 * w4.size * w4.dtype.itemsize
                + 2 * g * a * c * o_dim * h.dtype.itemsize
            ),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=jax.default_backend() != "tpu",
    )(hp, tp, w4, dop)
    return dh[:g], dtc[:g], dw4


_pooled_conv.defvjp(_pc_fwd, _pc_bwd)


def pooled_conv(h, tc, w, c):
    """out[g, a, c, o] = Σ_{i,f} W[f,o,i] · Σ_k h[g,a,k,f] · tc[g,a,k,(c,i)].

    h [G, A, K, F]; tc [G, A, K, C·I] (c outer, i inner); w [F, O, I].
    Returns [G, A, C, O] in h.dtype (f32 accumulation throughout). The
    whole unit — M-build, projection, and both backward contractions —
    runs in VMEM; M never exists in HBM.
    """
    f, o_dim, i = w.shape
    ic = i // _ISPLIT
    # [F, O, I] -> [I, F, O] -> [I/S, S·F, O], matching the m2 row layout
    w4 = jnp.transpose(w, (2, 0, 1)).reshape(ic, _ISPLIT * f, o_dim)
    return _pooled_conv(h, tc, w4, c)
