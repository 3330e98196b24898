"""Pallas TPU kernels: fused ViS_MP vector-interaction block.

ViSNet is the most bandwidth-bound encoder in the suite: 354 GB/step against
a 39 ms compute floor (ROOFLINE.json, an 11x window). Per-fusion byte
attribution (`scripts/fusion_bytes.py`) shows the bytes come from the two
per-l neighbor-gather loops in `nn/visnet.py` (ViS_MP): 16 einsums per layer
producing [G,A,k,h] HBM temps, plus the per-l slice / stack-DUS chains and
their backward mirrors — several hundred async-copy chunks per step.

Two kernels (vec_agg; w_dot), each gridded (row-block i, h-block j), with
the semantics of `reference equihgnn/models/layers/visnet_layer.py:472-679`
— vector aggregation and the vector-rejection edge dot products, in the
algebraically expanded form of nn/visnet.py:

  vec_agg kernel:
    vecj[i,k,l,:]  = vec[j(i,k),l,:]            (masked neighbor gather)
    vec_agg[i,l,:] = sum_k s1[i,k,:]*vecj[i,k,l,:] + sum_k s2m[i,k,:]*d[i,l,k]
  w_dot kernel:
    vvj[i,k,l,:]   = vv[j(i,k),l,:]
    uv[i,k,:]      = sum_l u[i,l,:]*vvj[i,k,l,:]
    vd[i,k,:]      = sum_l d[i,l,k]*vvj[i,k,l,:]
    ud[i,k,:]      = sum_l u[i,l,:]*d[i,l,k]
    w_dot[i,k,:]   = uv - ud*vd*(2 - sum_l d[i,l,k]^2)

Performance shape (four iterations measured on the v5e, each gated on a
device trace):
  * f32 MXU operands ran the matmuls in multi-pass emulation — 963 ms vs
    the 428 ms XLA baseline. The MXU operands are bf16 (exact re-casts on
    the sub-f32 path this kernel is gated to; XLA's own DEFAULT-precision
    einsums round identically), accumulation f32.
  * one molecule row per grid step left ~10 us of per-step overhead on 45k
    tiny steps — rows are processed _GT=4 per step, with the gathers as ONE
    block-diagonal one-hot matmul [GT*k*A, GT*A] x [GT*A, hb] per l
    (K = GT*A = 128 = one full MXU pass; the off-diagonal zeros cost 4x
    FLOPs against a >10x bandwidth window).
  * Mosaic's scoped-VMEM allocator keeps unrolled-loop temps live (a
    full-h unrolled kernel hit 17.5 MB / 16 MB): the l loop is a
    lax.fori_loop, l sits in a LEADING block dim (dynamic slicing a
    sublane dim requires 8-aligned indices), and `vmem_limit_bytes` raises
    the 16 MB default scope.
  * the first working cut spent ~180 us/grid-step in physical re-tilings:
    reshaping the [E, hb] gather matmul output to [.., k=17, hb] splits
    the sublane dim at a non-multiple-of-8 (trace: 43 ms per wdot-bwd
    call, 65% of the step in kernels). All in-kernel tensors are therefore
    EDGE-K-MAJOR — [GT*k, A, hb] with A=32 sublanes — so every reshape
    to/from the 2-D matmul forms is a pure leading-dim regroup, and the
    per-edge broadcasts of row tensors insert leading dims only. The
    caller transposes the [G,A,k,h] operands to [G,k,A,h] at the XLA
    boundary (fused into producers by XLA layout assignment).

The only cross-h reductions are the d-gradients; those accumulate into a
revisited output block across the inner h-grid (the segment_sum.py
pattern). Backward kernels rematerialize the gathers in VMEM and emit all
input gradients; `d` receives one contribution from each kernel, summed by
the caller's VJP.

Semantics identical to the unfused composition (`_xla_mix` below, the exact
code this replaces); masked edges produce zero rows through the masked
one-hot, matching the XLA path's `onehot & mask` construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from equihgnn_tpu.ops import flop_tally

_f32 = jnp.float32
_bf16 = jnp.bfloat16
_HB = 128  # h-block (lane) width
_GT = 4  # molecule rows per grid step


def _dot(x, y):
    """MXU matmul: bf16 operands, f32 accumulation, DEFAULT precision
    (Mosaic rejects bf16 matmuls carrying HIGHEST from an ambient context)."""
    return jnp.dot(
        x.astype(_bf16), y.astype(_bf16),
        preferred_element_type=_f32, precision=lax.Precision.DEFAULT,
    )


def _dotT(x, y):
    """Contract dim 0 of x [E, A'] with dim 0 of y [E, h] -> [A', h]."""
    return lax.dot_general(
        x.astype(_bf16), y.astype(_bf16),
        (((0,), (0,)), ((), ())), preferred_element_type=_f32,
        precision=lax.Precision.DEFAULT,
    )


def _block_onehot(idx, maskf, gt, a, k):
    """[GT*k*A, GT*A] block-diagonal masked selection matrix, edge-k-major.

    idx/maskf arrive [GT, k, A]; edge e=(g,kk,i) selects source column
    g*A + idx[g,kk,i] — molecules never gather across rows. All reshapes
    stay pure (only untiled leading dims and the a%8==0 sublane dim merge).
    """
    ap = gt * a
    off = lax.broadcasted_iota(jnp.int32, (gt, k, a), 0) * a
    tgt = idx + off
    iota = lax.broadcasted_iota(jnp.int32, (gt, k, a, ap), 3)
    oh = jnp.where(iota == tgt[..., None], maskf[..., None], 0.0)
    return oh.reshape(gt * k * a, ap).astype(_bf16)


def _bc_rows(u_row, k):
    """[GT, A, hb] row tensor -> [GT, k, A, hb] per-edge (leading-only)."""
    return jnp.broadcast_to(
        u_row[:, None], (u_row.shape[0], k) + u_row.shape[1:]
    )


# --------------------------------------------------------------- vec_agg


def _agg_fwd_kernel(idx_ref, maskf_ref, vec_ref, s1_ref, s2m_ref, d_ref,
                    vecagg_ref):
    gt, k, a = idx_ref.shape
    L = vec_ref.shape[1]  # vec [GT, L, A, hb]
    oh = _block_onehot(idx_ref[...], maskf_ref[...], gt, a, k)
    s1 = s1_ref[...].astype(_f32)  # [GT, k, A, hb]
    s2m = s2m_ref[...].astype(_f32)

    def body(l, _):
        d_l = d_ref[:, pl.ds(l, 1), :, :].reshape(gt, k, a).astype(_f32)
        vec_l = vec_ref[:, pl.ds(l, 1), :, :].reshape(gt * a, -1)
        vecj = _dot(oh, vec_l).reshape(gt, k, a, -1)
        agg = (s1 * vecj + s2m * d_l[..., None]).sum(axis=1)
        vecagg_ref[:, pl.ds(l, 1), :, :] = agg.reshape(gt, 1, a, -1).astype(
            vecagg_ref.dtype
        )
        return 0

    lax.fori_loop(0, L, body, 0)


def _agg_bwd_kernel(idx_ref, maskf_ref, vec_ref, s1_ref, s2m_ref, d_ref,
                    gva_ref, dvec_ref, ds1_ref, ds2m_ref, dd_ref):
    gt, k, a = idx_ref.shape
    L = vec_ref.shape[1]
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        dd_ref[...] = jnp.zeros_like(dd_ref)

    oh = _block_onehot(idx_ref[...], maskf_ref[...], gt, a, k)
    s1 = s1_ref[...].astype(_f32)  # [GT, k, A, hb]
    s2m = s2m_ref[...].astype(_f32)

    def body(l, carry):
        ds1, ds2m = carry
        d_l = d_ref[:, pl.ds(l, 1), :, :].reshape(gt, k, a).astype(_f32)
        g_row = gva_ref[:, pl.ds(l, 1), :, :].reshape(gt, a, -1).astype(_f32)
        g_va = _bc_rows(g_row, k)  # [GT, k, A, hb]
        vec_l = vec_ref[:, pl.ds(l, 1), :, :].reshape(gt * a, -1)
        vecj = _dot(oh, vec_l).reshape(gt, k, a, -1)
        ds1 = ds1 + vecj * g_va
        ds2m = ds2m + d_l[..., None] * g_va
        dvecj = s1 * g_va
        dvec_l = _dotT(oh, dvecj.reshape(gt * k * a, -1))  # [GT*A, hb]
        dvec_ref[:, pl.ds(l, 1), :, :] = dvec_l.reshape(gt, 1, a, -1).astype(
            dvec_ref.dtype
        )
        dd_l = jnp.sum(s2m * g_va, axis=-1)  # [GT, k, A]
        prev = dd_ref[:, pl.ds(l, 1), :, :]
        dd_ref[:, pl.ds(l, 1), :, :] = prev + dd_l[:, None].astype(
            dd_ref.dtype
        )
        return ds1, ds2m

    z = jnp.zeros(s1.shape, _f32)
    ds1, ds2m = lax.fori_loop(0, L, body, (z, z))
    ds1_ref[...] = ds1.astype(ds1_ref.dtype)
    ds2m_ref[...] = ds2m.astype(ds2m_ref.dtype)


# ---------------------------------------------------------------- w_dot


def _wdot_fwd_kernel(idx_ref, maskf_ref, d_ref, u_ref, vv_ref, wdot_ref):
    gt, k, a = idx_ref.shape
    L = u_ref.shape[1]
    oh = _block_onehot(idx_ref[...], maskf_ref[...], gt, a, k)
    hb = u_ref.shape[-1]

    def body(l, carry):
        uv, vd, ud, dd = carry
        d_l = d_ref[:, pl.ds(l, 1), :, :].reshape(gt, k, a).astype(_f32)
        u_l = _bc_rows(
            u_ref[:, pl.ds(l, 1), :, :].reshape(gt, a, -1).astype(_f32), k
        )
        vv_l = vv_ref[:, pl.ds(l, 1), :, :].reshape(gt * a, -1)
        vvj = _dot(oh, vv_l).reshape(gt, k, a, -1)
        uv = uv + u_l * vvj
        vd = vd + d_l[..., None] * vvj
        ud = ud + u_l * d_l[..., None]
        dd = dd + d_l * d_l
        return uv, vd, ud, dd

    z = jnp.zeros((gt, k, a, hb), _f32)
    uv, vd, ud, dd = lax.fori_loop(
        0, L, body, (z, z, z, jnp.zeros((gt, k, a), _f32))
    )
    w = uv - ud * vd * (2.0 - dd[..., None])
    wdot_ref[...] = w.astype(wdot_ref.dtype)


def _wdot_bwd_kernel(idx_ref, maskf_ref, d_ref, u_ref, vv_ref, gw_ref,
                     du_ref, dvv_ref, dd_ref):
    gt, k, a = idx_ref.shape
    L = u_ref.shape[1]
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        dd_ref[...] = jnp.zeros_like(dd_ref)

    oh = _block_onehot(idx_ref[...], maskf_ref[...], gt, a, k)
    gw = gw_ref[...].astype(_f32)  # [GT, k, A, hb]
    hb = gw.shape[-1]

    # pass 1: rematerialize vd / ud / dd (uv is not needed: duv = gw)
    def body1(l, carry):
        vd, ud, dd = carry
        d_l = d_ref[:, pl.ds(l, 1), :, :].reshape(gt, k, a).astype(_f32)
        u_l = _bc_rows(
            u_ref[:, pl.ds(l, 1), :, :].reshape(gt, a, -1).astype(_f32), k
        )
        vvj = _dot(
            oh, vv_ref[:, pl.ds(l, 1), :, :].reshape(gt * a, -1)
        ).reshape(gt, k, a, -1)
        vd = vd + d_l[..., None] * vvj
        ud = ud + u_l * d_l[..., None]
        dd = dd + d_l * d_l
        return vd, ud, dd

    z = jnp.zeros((gt, k, a, hb), _f32)
    vd, ud, dd = lax.fori_loop(
        0, L, body1, (z, z, jnp.zeros((gt, k, a), _f32))
    )
    t = 2.0 - dd[..., None]
    dud = -gw * vd * t
    dvd = -gw * ud * t
    g_dd = jnp.sum(gw * ud * vd, axis=-1)  # [GT, k, A] partial over h block

    def body2(l, _):
        d_l = d_ref[:, pl.ds(l, 1), :, :].reshape(gt, k, a).astype(_f32)
        u_l = _bc_rows(
            u_ref[:, pl.ds(l, 1), :, :].reshape(gt, a, -1).astype(_f32), k
        )
        vvj = _dot(
            oh, vv_ref[:, pl.ds(l, 1), :, :].reshape(gt * a, -1)
        ).reshape(gt, k, a, -1)
        dvvj = gw * u_l + dvd * d_l[..., None]
        dvv_l = _dotT(oh, dvvj.reshape(gt * k * a, -1))  # [GT*A, hb]
        dvv_ref[:, pl.ds(l, 1), :, :] = dvv_l.reshape(gt, 1, a, -1).astype(
            dvv_ref.dtype
        )
        du_l = (gw * vvj + dud * d_l[..., None]).sum(axis=1)
        du_ref[:, pl.ds(l, 1), :, :] = du_l.reshape(gt, 1, a, -1).astype(
            du_ref.dtype
        )
        # all three terms are h-sums -> accumulate partials across h blocks
        dd_l = (
            jnp.sum(dvd * vvj, axis=-1)
            + jnp.sum(dud * u_l, axis=-1)
            + 2.0 * d_l * g_dd
        )
        prev = dd_ref[:, pl.ds(l, 1), :, :]
        dd_ref[:, pl.ds(l, 1), :, :] = prev + dd_l[:, None].astype(
            dd_ref.dtype
        )
        return 0

    lax.fori_loop(0, L, body2, 0)


VMEM_BUDGET = 13 * 2**20


def vis_mix_supported(a: int, k: int, L: int, h: int, dtype=None) -> bool:
    # sub-f32 gate: the in-kernel MXU matmuls run bf16 (exact for bf16
    # data); the f32 parity path keeps the XLA composition
    if dtype is not None and jnp.dtype(dtype) == jnp.float32:
        return False
    if h > _HB and h % _HB != 0:
        return False
    if a % 8 != 0:
        return False  # edge-k-major layout needs A on sublane boundaries
    hb = min(h, _HB)
    lead = _GT * k
    lanes_h = max(hb, 128)
    oh = lead * a * max(_GT * a, 128) * 2
    gathered = lead * a * lanes_h * 4
    accum = 5 * lead * a * lanes_h * 4
    io = 2 * (2 * lead * a * lanes_h + 3 * _GT * L * a * lanes_h)
    return oh + gathered + accum + 2 * io < VMEM_BUDGET


def _xla_mix(vec, s1, s2m, d, nbr_idx, nbr_mask, u=None, vv=None):
    """Unfused reference composition (the exact code the kernels replace)."""
    g, a, k = nbr_idx.shape
    onehot = (
        (nbr_idx[..., None] == jnp.arange(a)[None, None, None, :])
        & nbr_mask[..., None]
    ).astype(vec.dtype)
    vec_agg = jnp.stack(
        [
            jnp.sum(
                s1 * jnp.einsum("gikj,gjh->gikh", onehot, vec[:, :, l]),
                axis=2,
            )
            for l in range(vec.shape[2])
        ],
        axis=2,
    ) + jnp.einsum("gikh,gikl->gilh", s2m, d)
    if u is None:
        return vec_agg, None
    uv = 0.0
    vd = 0.0
    for l in range(vec.shape[2]):
        vvk_l = jnp.einsum("gikj,gjh->gikh", onehot, vv[:, :, l])
        uv = uv + u[:, :, None, l, :] * vvk_l
        vd = vd + d[..., l][..., None] * vvk_l
    ud = jnp.einsum("gilh,gikl->gikh", u, d)
    dd = jnp.sum(d * d, axis=-1)[..., None]
    return vec_agg, uv - ud * vd * (2.0 - dd)


def vis_vector_mix(vec, s1, s2m, d, nbr_idx, nbr_mask, u=None, vv=None):
    """Fused ViS_MP vector interaction -> (vec_agg [G,A,L,h], w_dot|None).

    vec/u/vv [G,A,L,h]; s1/s2m [G,A,k,h] (s2m pre-masked); d [G,A,k,L] SH
    edge features; nbr_idx/nbr_mask [G,A,k]. u/vv omitted on the last layer
    (no edge update). Falls back to the XLA composition off-budget or on
    the f32 path.
    """
    g, a, L, h = vec.shape
    k = nbr_idx.shape[-1]
    if not vis_mix_supported(a, k, L, h, vec.dtype):
        return _xla_mix(vec, s1, s2m, d, nbr_idx, nbr_mask, u, vv)
    # one-hot gathers: L block-diag matmuls per kernel forward (GT-row
    # blocks, 4x FLOPs); backward rematerializes and adds the transpose
    # contractions (factor ~2 net, the forward-call-site convention)
    n_gather = 2 if u is not None else 1
    flop_tally.add(2 * n_gather * 2 * g * a * k * (_GT * a) * h * L)
    vec_agg = _vec_agg(vec, s1, s2m, d, nbr_idx, nbr_mask)
    if u is None:
        return vec_agg, None
    return vec_agg, _wdot(d, u, vv, nbr_idx, nbr_mask)


def _pad_rows(t, g, gp):
    if g == gp:
        return t
    pad = [(0, gp - g)] + [(0, 0)] * (t.ndim - 1)
    return jnp.pad(t, pad)


def _lmaj(t):
    """[G, A, L, minor] <-> [G, L, A, minor] (l leads for dynamic slicing)."""
    return jnp.swapaxes(t, 1, 2)


def _kmaj(t):
    """[G, A, k, ...] <-> [G, k, A, ...] (edge-k-major kernel layout)."""
    return jnp.swapaxes(t, 1, 2)


def _base_ins(d, nbr_idx, nbr_mask, gp):
    g = d.shape[0]
    dT = jnp.transpose(d, (0, 3, 2, 1))  # [G, L, k, A]
    return (
        _pad_rows(_kmaj(nbr_idx.astype(jnp.int32)), g, gp),
        # mask stays f32: Mosaic can't insert a minor dim on 16-bit types
        # (_block_onehot does maskf[:, :, None])
        _pad_rows(_kmaj(nbr_mask.astype(_f32)), g, gp),
        _pad_rows(dT, g, gp),
    )


def _ik_spec(k, a):
    return pl.BlockSpec((_GT, k, a), lambda i, j: (i, 0, 0))


def _d_spec(L, k, a):
    return pl.BlockSpec((_GT, L, k, a), lambda i, j: (i, 0, 0, 0))


def _l_spec(L, a, hb):
    """[G, L, A, h] l-major tensors, blocked over rows and h."""
    return pl.BlockSpec((_GT, L, a, hb), lambda i, j: (i, 0, 0, j))


def _k_spec(k, a, hb):
    """[G, k, A, h] edge-k-major tensors, blocked over rows and h."""
    return pl.BlockSpec((_GT, k, a, hb), lambda i, j: (i, 0, 0, j))


def _cost(g, a, k, L, h, n_mm, dt):
    b = jnp.dtype(dt).itemsize
    return pl.CostEstimate(
        flops=n_mm * 2 * g * a * k * (_GT * a) * h * L,
        bytes_accessed=b * g * a * (2 * L * h + 2 * k * h + L * k),
        transcendentals=0,
    )


_interp = lambda: jax.default_backend() != "tpu"  # noqa: E731


def _params():
    """Raise the scoped-VMEM stack limit: Mosaic unrolls the l fori-loop and
    its allocator keeps per-iteration temps live (the backward measured
    29.9 MB against the default 16 MB scope at bench shapes)."""
    return pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024)


@jax.custom_vjp
def _vec_agg(vec, s1, s2m, d, nbr_idx, nbr_mask):
    out, _ = _vec_agg_fwd(vec, s1, s2m, d, nbr_idx, nbr_mask)
    return out


def _vec_agg_fwd(vec, s1, s2m, d, nbr_idx, nbr_mask):
    g, a, L, h = vec.shape
    k = nbr_idx.shape[-1]
    hb = min(h, _HB)
    gp = ((g + _GT - 1) // _GT) * _GT
    idx, maskf, dT = _base_ins(d, nbr_idx, nbr_mask, gp)
    vec_agg = pl.pallas_call(
        _agg_fwd_kernel,
        grid=(gp // _GT, h // hb),
        in_specs=[
            _ik_spec(k, a), _ik_spec(k, a), _l_spec(L, a, hb),
            _k_spec(k, a, hb), _k_spec(k, a, hb), _d_spec(L, k, a),
        ],
        out_specs=_l_spec(L, a, hb),
        out_shape=jax.ShapeDtypeStruct((gp, L, a, h), vec.dtype),
        cost_estimate=_cost(g, a, k, L, h, 1, vec.dtype),
        compiler_params=_params(),
        interpret=_interp(),
    )(idx, maskf, _pad_rows(_lmaj(vec), g, gp), _pad_rows(_kmaj(s1), g, gp),
      _pad_rows(_kmaj(s2m), g, gp), dT)
    return _lmaj(vec_agg[:g]), (vec, s1, s2m, d, nbr_idx, nbr_mask)


def _vec_agg_bwd(res, g_va):
    vec, s1, s2m, d, nbr_idx, nbr_mask = res
    g, a, L, h = vec.shape
    k = nbr_idx.shape[-1]
    hb = min(h, _HB)
    gp = ((g + _GT - 1) // _GT) * _GT
    idx, maskf, dT = _base_ins(d, nbr_idx, nbr_mask, gp)
    dvec, ds1, ds2m, ddT = pl.pallas_call(
        _agg_bwd_kernel,
        grid=(gp // _GT, h // hb),
        in_specs=[
            _ik_spec(k, a), _ik_spec(k, a), _l_spec(L, a, hb),
            _k_spec(k, a, hb), _k_spec(k, a, hb), _d_spec(L, k, a),
            _l_spec(L, a, hb),
        ],
        out_specs=[
            _l_spec(L, a, hb), _k_spec(k, a, hb), _k_spec(k, a, hb),
            _d_spec(L, k, a),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((gp, L, a, h), vec.dtype),
            jax.ShapeDtypeStruct((gp, k, a, h), s1.dtype),
            jax.ShapeDtypeStruct((gp, k, a, h), s2m.dtype),
            jax.ShapeDtypeStruct((gp, L, k, a), _f32),
        ],
        cost_estimate=_cost(g, a, k, L, h, 2, vec.dtype),
        compiler_params=_params(),
        interpret=_interp(),
    )(idx, maskf, _pad_rows(_lmaj(vec), g, gp), _pad_rows(_kmaj(s1), g, gp),
      _pad_rows(_kmaj(s2m), g, gp), dT, _pad_rows(_lmaj(g_va), g, gp))
    return (
        _lmaj(dvec[:g]), _kmaj(ds1[:g]), _kmaj(ds2m[:g]),
        jnp.transpose(ddT[:g], (0, 3, 2, 1)).astype(d.dtype), None, None,
    )


_vec_agg.defvjp(_vec_agg_fwd, _vec_agg_bwd)


@jax.custom_vjp
def _wdot(d, u, vv, nbr_idx, nbr_mask):
    out, _ = _wdot_fwd(d, u, vv, nbr_idx, nbr_mask)
    return out


def _wdot_fwd(d, u, vv, nbr_idx, nbr_mask):
    g, a, L, h = u.shape
    k = nbr_idx.shape[-1]
    hb = min(h, _HB)
    gp = ((g + _GT - 1) // _GT) * _GT
    idx, maskf, dT = _base_ins(d, nbr_idx, nbr_mask, gp)
    w_dot = pl.pallas_call(
        _wdot_fwd_kernel,
        grid=(gp // _GT, h // hb),
        in_specs=[
            _ik_spec(k, a), _ik_spec(k, a), _d_spec(L, k, a),
            _l_spec(L, a, hb), _l_spec(L, a, hb),
        ],
        out_specs=_k_spec(k, a, hb),
        out_shape=jax.ShapeDtypeStruct((gp, k, a, h), u.dtype),
        cost_estimate=_cost(g, a, k, L, h, 1, u.dtype),
        compiler_params=_params(),
        interpret=_interp(),
    )(idx, maskf, dT, _pad_rows(_lmaj(u), g, gp), _pad_rows(_lmaj(vv), g, gp))
    return _kmaj(w_dot[:g]), (d, u, vv, nbr_idx, nbr_mask)


def _wdot_bwd(res, g_w):
    d, u, vv, nbr_idx, nbr_mask = res
    g, a, L, h = u.shape
    k = nbr_idx.shape[-1]
    hb = min(h, _HB)
    gp = ((g + _GT - 1) // _GT) * _GT
    idx, maskf, dT = _base_ins(d, nbr_idx, nbr_mask, gp)
    du, dvv, ddT = pl.pallas_call(
        _wdot_bwd_kernel,
        grid=(gp // _GT, h // hb),
        in_specs=[
            _ik_spec(k, a), _ik_spec(k, a), _d_spec(L, k, a),
            _l_spec(L, a, hb), _l_spec(L, a, hb), _k_spec(k, a, hb),
        ],
        out_specs=[
            _l_spec(L, a, hb), _l_spec(L, a, hb), _d_spec(L, k, a),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((gp, L, a, h), u.dtype),
            jax.ShapeDtypeStruct((gp, L, a, h), vv.dtype),
            jax.ShapeDtypeStruct((gp, L, k, a), _f32),
        ],
        cost_estimate=_cost(g, a, k, L, h, 4, u.dtype),
        compiler_params=_params(),
        interpret=_interp(),
    )(idx, maskf, dT, _pad_rows(_lmaj(u), g, gp), _pad_rows(_lmaj(vv), g, gp),
      _pad_rows(_kmaj(g_w), g, gp))
    return (
        jnp.transpose(ddT[:g], (0, 3, 2, 1)).astype(d.dtype),
        _lmaj(du[:g]), _lmaj(dvv[:g]), None, None,
    )


_wdot.defvjp(_wdot_fwd, _wdot_bwd)


# Back-compat aliases for the sanity script / tests: the "edge" entry point
# returns both outputs; "last" returns vec_agg only.
def _mix_edge(vec, s1, s2m, d, nbr_idx, nbr_mask, u, vv):
    return (
        _vec_agg(vec, s1, s2m, d, nbr_idx, nbr_mask),
        _wdot(d, u, vv, nbr_idx, nbr_mask),
    )


def _mix_last(vec, s1, s2m, d, nbr_idx, nbr_mask):
    return _vec_agg(vec, s1, s2m, d, nbr_idx, nbr_mask)
