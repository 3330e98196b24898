"""Pallas TPU kernels: fused ViS_MP vector-interaction block.

ViSNet is the most bandwidth-bound encoder in the suite: 354 GB/step against
a 39 ms compute floor (ROOFLINE.json, an 11x window). Per-fusion byte
attribution (`scripts/fusion_bytes.py`) shows the bytes come from the two
per-l neighbor-gather loops in `nn/visnet.py` (ViS_MP): 16 einsums per layer
producing [G,A,k,h] HBM temps, plus the per-l slice / stack-DUS chains and
their backward mirrors — several hundred async-copy chunks per step.

Two kernels (one monolithic kernel OOMed the 16 MB VMEM stack at bench
shapes), each gridded per molecule row with everything in VMEM (`reference
equihgnn/models/layers/visnet_layer.py:472-679` — vector aggregation and the
vector-rejection edge dot products, in the algebraically expanded form of
nn/visnet.py):

  vec_agg kernel:
    vecj[i,k,l,:]  = vec[j(i,k),l,:]            (masked neighbor gather)
    vec_agg[i,l,:] = sum_k s1[i,k,:]*vecj[i,k,l,:] + sum_k s2m[i,k,:]*d[i,l,k]
  w_dot kernel:
    vvj[i,k,l,:]   = vv[j(i,k),l,:]
    uv[i,k,:]      = sum_l u[i,l,:]*vvj[i,k,l,:]
    vd[i,k,:]      = sum_l d[i,l,k]*vvj[i,k,l,:]
    ud[i,k,:]      = sum_l u[i,l,:]*d[i,l,k]
    w_dot[i,k,:]   = uv - ud*vd*(2 - sum_l d[i,l,k]^2)

The gathers are one-hot MXU matmuls ([A*k, A] x [A, h] per l) built
in-kernel from the neighbor index table; none of the [A,k,L,h]-sized
gathered tensors or the 16 per-l [G,A,k,h] temps ever reach HBM. The
backward kernels rematerialize the gathers in VMEM and emit all input
gradients (no parameter accumulation across the grid — every gradient is
row-local); `d` receives one contribution from each kernel, summed by the
caller's VJP. `d` is passed [G,A,L,k] (k minor) so per-l slicing stays on a
sublane dimension.

Semantics identical to the unfused composition (`_xla_mix` below, the exact
code this replaces); masked edges produce zero rows through the masked
one-hot, matching the XLA path's `onehot & mask` construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from equihgnn_tpu.ops import flop_tally

_f32 = jnp.float32


def _dot(x, y):
    return jnp.dot(x, y, preferred_element_type=_f32)


def _dotT(x, y):
    """Contract dim 0 of x [E, A] with dim 0 of y [E, h] -> [A, h]."""
    return lax.dot_general(
        x, y, (((0,), (0,)), ((), ())), preferred_element_type=_f32
    )


def _masked_onehot(idx, maskf, a, k):
    """[A*k, A] masked selection matrix from the neighbor index table."""
    iota = lax.broadcasted_iota(jnp.int32, (a, k, a), 2)
    oh = jnp.where(iota == idx[:, :, None], maskf[:, :, None], 0.0)
    return oh.reshape(a * k, a)


# --------------------------------------------------------------- vec_agg


def _agg_fwd_kernel(idx_ref, maskf_ref, vec_ref, s1_ref, s2m_ref, d_ref,
                    vecagg_ref):
    a, k = idx_ref.shape[1], idx_ref.shape[2]
    L = vec_ref.shape[2]
    oh = _masked_onehot(idx_ref[0], maskf_ref[0], a, k)
    for l in range(L):
        d_l = d_ref[0, :, l, :]  # [A, k]
        vecj = _dot(oh, vec_ref[0, :, l, :]).reshape(a, k, -1)
        vecagg_ref[0, :, l, :] = (
            jnp.sum(s1_ref[0] * vecj, axis=1)
            + jnp.sum(s2m_ref[0] * d_l[:, :, None], axis=1)
        )


def _agg_bwd_kernel(idx_ref, maskf_ref, vec_ref, s1_ref, s2m_ref, d_ref,
                    gva_ref, dvec_ref, ds1_ref, ds2m_ref, dd_ref):
    a, k = idx_ref.shape[1], idx_ref.shape[2]
    L = vec_ref.shape[2]
    oh = _masked_onehot(idx_ref[0], maskf_ref[0], a, k)
    ds1 = jnp.zeros(s1_ref.shape[1:], _f32)
    ds2m = jnp.zeros(s1_ref.shape[1:], _f32)
    for l in range(L):
        d_l = d_ref[0, :, l, :]
        g_va = gva_ref[0, :, l, :]  # [A, h]
        vecj = _dot(oh, vec_ref[0, :, l, :]).reshape(a, k, -1)
        ds1 = ds1 + vecj * g_va[:, None, :]
        ds2m = ds2m + d_l[:, :, None] * g_va[:, None, :]
        dvecj = s1_ref[0] * g_va[:, None, :]
        dvec_ref[0, :, l, :] = _dotT(oh, dvecj.reshape(a * k, -1))
        dd_ref[0, :, l, :] = jnp.sum(s2m_ref[0] * g_va[:, None, :], axis=-1)
    ds1_ref[0] = ds1
    ds2m_ref[0] = ds2m


# ---------------------------------------------------------------- w_dot


def _wdot_fwd_kernel(idx_ref, maskf_ref, d_ref, u_ref, vv_ref, wdot_ref):
    a, k = idx_ref.shape[1], idx_ref.shape[2]
    L = u_ref.shape[2]
    oh = _masked_onehot(idx_ref[0], maskf_ref[0], a, k)
    uv = jnp.zeros(wdot_ref.shape[1:], _f32)
    vd = jnp.zeros(wdot_ref.shape[1:], _f32)
    ud = jnp.zeros(wdot_ref.shape[1:], _f32)
    dd = jnp.zeros((a, k), _f32)
    for l in range(L):
        d_l = d_ref[0, :, l, :]
        u_l = u_ref[0, :, l, :]
        vvj = _dot(oh, vv_ref[0, :, l, :]).reshape(a, k, -1)
        uv = uv + u_l[:, None, :] * vvj
        vd = vd + d_l[:, :, None] * vvj
        ud = ud + u_l[:, None, :] * d_l[:, :, None]
        dd = dd + d_l * d_l
    wdot_ref[0] = uv - ud * vd * (2.0 - dd[:, :, None])


def _wdot_bwd_kernel(idx_ref, maskf_ref, d_ref, u_ref, vv_ref, gw_ref,
                     du_ref, dvv_ref, dd_ref):
    a, k = idx_ref.shape[1], idx_ref.shape[2]
    L = u_ref.shape[2]
    oh = _masked_onehot(idx_ref[0], maskf_ref[0], a, k)
    # pass 1: rematerialize vd / ud / dd (uv is not needed: duv = gw)
    vd = jnp.zeros(gw_ref.shape[1:], _f32)
    ud = jnp.zeros(gw_ref.shape[1:], _f32)
    dd = jnp.zeros((a, k), _f32)
    for l in range(L):
        d_l = d_ref[0, :, l, :]
        u_l = u_ref[0, :, l, :]
        vvj = _dot(oh, vv_ref[0, :, l, :]).reshape(a, k, -1)
        vd = vd + d_l[:, :, None] * vvj
        ud = ud + u_l[:, None, :] * d_l[:, :, None]
        dd = dd + d_l * d_l
    gw = gw_ref[0]
    t = 2.0 - dd[:, :, None]
    dud = -gw * vd * t
    dvd = -gw * ud * t
    g_dd = jnp.sum(gw * ud * vd, axis=-1)  # [A, k]
    for l in range(L):
        d_l = d_ref[0, :, l, :]
        u_l = u_ref[0, :, l, :]
        vvj = _dot(oh, vv_ref[0, :, l, :]).reshape(a, k, -1)
        dvvj = gw * u_l[:, None, :] + dvd * d_l[:, :, None]
        dvv_ref[0, :, l, :] = _dotT(oh, dvvj.reshape(a * k, -1))
        du_ref[0, :, l, :] = (
            jnp.sum(gw * vvj, axis=1)
            + jnp.sum(dud * d_l[:, :, None], axis=1)
        )
        dd_ref[0, :, l, :] = (
            jnp.sum(dvd * vvj, axis=-1)
            + jnp.sum(dud * u_l[:, None, :], axis=-1)
            + 2.0 * d_l * g_dd
        )


# VMEM budget: per-l [A*k, h] gather product + [A,k,h] accumulators + the
# [A,L,h] vec/u/vv tiles, all f32, plus Mosaic double-buffering of the
# per-row inputs. 16 MB/core; leave headroom (the split into two kernels
# exists because the monolith hit 17.5 MB at bench shapes).
VMEM_BUDGET = 9 * 2**20


def vis_mix_supported(a: int, k: int, L: int, h: int) -> bool:
    lanes_h = max(h, 128)
    lanes_a = max(a, 128)
    lanes_k = max(k, 128)
    f = 4
    gathered = a * k * lanes_h * f            # one [A*k, h] product
    accum = 4 * a * k * lanes_h * f           # uv/vd/ud + one temp
    tiles = 2 * a * L * lanes_h * f           # u/vv (or vec) rows
    oh = a * k * lanes_a * f
    io = 2 * a * k * lanes_h * f + a * L * lanes_h * f + a * L * lanes_k * f
    return gathered + accum + tiles + oh + 2 * io < VMEM_BUDGET


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
    (no edge update). Falls back to the XLA composition off-budget.
    """
    g, a, L, h = vec.shape
    k = nbr_idx.shape[-1]
    if not vis_mix_supported(a, k, L, h):
        return _xla_mix(vec, s1, s2m, d, nbr_idx, nbr_mask, u, vv)
    # one-hot gathers: L matmuls per kernel forward; backward rematerializes
    # and adds the transpose contractions (factor ~2 net, the
    # forward-call-site convention of flop_tally)
    n_gather = 2 if u is not None else 1
    flop_tally.add(2 * n_gather * 2 * g * a * k * a * h * L)
    vec_agg = _vec_agg(vec, s1, s2m, d, nbr_idx, nbr_mask)
    if u is None:
        return vec_agg, None
    return vec_agg, _wdot(d, u, vv, nbr_idx, nbr_mask)


def _base_ins(d, nbr_idx, nbr_mask):
    dT = jnp.swapaxes(d, 2, 3)  # [G, A, L, k]: per-l slices on a sublane dim
    return nbr_idx.astype(jnp.int32), nbr_mask.astype(_f32), dT.astype(_f32)


def _row_spec(*dims):
    n = len(dims)
    return pl.BlockSpec((1,) + dims, lambda i: (i,) + (0,) * n)


def _cost(g, a, k, L, h, n_mm):
    return pl.CostEstimate(
        flops=n_mm * 2 * g * a * k * a * h * L,
        bytes_accessed=4 * g * a * (2 * L * h + 2 * k * h + L * k),
        transcendentals=0,
    )


_interp = lambda: jax.default_backend() != "tpu"  # noqa: E731


@jax.custom_vjp
def _vec_agg(vec, s1, s2m, d, nbr_idx, nbr_mask):
    out, _ = _vec_agg_fwd(vec, s1, s2m, d, nbr_idx, nbr_mask)
    return out


def _vec_agg_fwd(vec, s1, s2m, d, nbr_idx, nbr_mask):
    g, a, L, h = vec.shape
    k = nbr_idx.shape[-1]
    idx, maskf, dT = _base_ins(d, nbr_idx, nbr_mask)
    vec_agg = pl.pallas_call(
        _agg_fwd_kernel,
        grid=(g,),
        in_specs=[
            _row_spec(a, k), _row_spec(a, k), _row_spec(a, L, h),
            _row_spec(a, k, h), _row_spec(a, k, h), _row_spec(a, L, k),
        ],
        out_specs=_row_spec(a, L, h),
        out_shape=jax.ShapeDtypeStruct((g, a, L, h), _f32),
        cost_estimate=_cost(g, a, k, L, h, 1),
        interpret=_interp(),
    )(idx, maskf, vec.astype(_f32), s1.astype(_f32), s2m.astype(_f32), dT)
    return vec_agg.astype(vec.dtype), (vec, s1, s2m, d, nbr_idx, nbr_mask)


def _vec_agg_bwd(res, g_va):
    vec, s1, s2m, d, nbr_idx, nbr_mask = res
    g, a, L, h = vec.shape
    k = nbr_idx.shape[-1]
    idx, maskf, dT = _base_ins(d, nbr_idx, nbr_mask)
    dvec, ds1, ds2m, ddT = pl.pallas_call(
        _agg_bwd_kernel,
        grid=(g,),
        in_specs=[
            _row_spec(a, k), _row_spec(a, k), _row_spec(a, L, h),
            _row_spec(a, k, h), _row_spec(a, k, h), _row_spec(a, L, k),
            _row_spec(a, L, h),
        ],
        out_specs=[
            _row_spec(a, L, h), _row_spec(a, k, h), _row_spec(a, k, h),
            _row_spec(a, L, k),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g, a, L, h), _f32),
            jax.ShapeDtypeStruct((g, a, k, h), _f32),
            jax.ShapeDtypeStruct((g, a, k, h), _f32),
            jax.ShapeDtypeStruct((g, a, L, k), _f32),
        ],
        cost_estimate=_cost(g, a, k, L, h, 2),
        interpret=_interp(),
    )(idx, maskf, vec.astype(_f32), s1.astype(_f32), s2m.astype(_f32), dT,
      g_va.astype(_f32))
    return (
        dvec.astype(vec.dtype), ds1.astype(s1.dtype), ds2m.astype(s2m.dtype),
        jnp.swapaxes(ddT, 2, 3).astype(d.dtype), None, None,
    )


_vec_agg.defvjp(_vec_agg_fwd, _vec_agg_bwd)


@jax.custom_vjp
def _wdot(d, u, vv, nbr_idx, nbr_mask):
    out, _ = _wdot_fwd(d, u, vv, nbr_idx, nbr_mask)
    return out


def _wdot_fwd(d, u, vv, nbr_idx, nbr_mask):
    g, a, L, h = u.shape
    k = nbr_idx.shape[-1]
    idx, maskf, dT = _base_ins(d, nbr_idx, nbr_mask)
    w_dot = pl.pallas_call(
        _wdot_fwd_kernel,
        grid=(g,),
        in_specs=[
            _row_spec(a, k), _row_spec(a, k), _row_spec(a, L, k),
            _row_spec(a, L, h), _row_spec(a, L, h),
        ],
        out_specs=_row_spec(a, k, h),
        out_shape=jax.ShapeDtypeStruct((g, a, k, h), _f32),
        cost_estimate=_cost(g, a, k, L, h, 1),
        interpret=_interp(),
    )(idx, maskf, dT, u.astype(_f32), vv.astype(_f32))
    return w_dot.astype(u.dtype), (d, u, vv, nbr_idx, nbr_mask)


def _wdot_bwd(res, g_w):
    d, u, vv, nbr_idx, nbr_mask = res
    g, a, L, h = u.shape
    k = nbr_idx.shape[-1]
    idx, maskf, dT = _base_ins(d, nbr_idx, nbr_mask)
    du, dvv, ddT = pl.pallas_call(
        _wdot_bwd_kernel,
        grid=(g,),
        in_specs=[
            _row_spec(a, k), _row_spec(a, k), _row_spec(a, L, k),
            _row_spec(a, L, h), _row_spec(a, L, h), _row_spec(a, k, h),
        ],
        out_specs=[
            _row_spec(a, L, h), _row_spec(a, L, h), _row_spec(a, L, k),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g, a, L, h), _f32),
            jax.ShapeDtypeStruct((g, a, L, h), _f32),
            jax.ShapeDtypeStruct((g, a, L, k), _f32),
        ],
        cost_estimate=_cost(g, a, k, L, h, 4),
        interpret=_interp(),
    )(idx, maskf, dT, u.astype(_f32), vv.astype(_f32), g_w.astype(_f32))
    return (
        jnp.swapaxes(ddT, 2, 3).astype(d.dtype),
        du.astype(u.dtype), dvv.astype(vv.dtype), None, None,
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
