"""Pallas TPU kernel: the pooled ConvSE3 rank-K update M = Σ_k h_k ⊗ t_k.

The pooled TFN path (`nn/se3_transformer.py` `_ConvSE3Pair`, reference
`se3_transformer_layer.py:187-308`) hinges on the per-node contraction

    M[g, a, f, x] = Σ_k h[g, a, k, f] · tc[g, a, k, x]        (k = 16)

i.e. G·A independent [F, K]×[K, X] matmuls with a K=16 contraction — the
most MXU-hostile shape in the model. A device decomposition probe put XLA's
lowering at 16.7 ms for 48 GFLOP (~2.9 TF/s, PERF.md "SE3 round-4"): the
batched-small-matmul emulation loses to layout shuffles on top of the
inherent K/128 = 12.5% systolic-depth ceiling.

This kernel tiles 8 node sites per program and issues one MXU dot per site
([X, K]×[K, F], f32 accumulation). Mosaic pads the K=16 contraction to the
128-deep array — an 8× silicon inflation that is unavoidable at this K —
but keeps every operand in VMEM and emits the output directly in the
consumer's preferred [..., c, i, f] layout (i, f minor), so the downstream
projection einsum `("foi,gacif->gaoc")` is a single clean
[G·A·C, I·F]×[I·F, O] matmul with no transposes. In bf16 the padded dots
run ~5× faster than XLA's f32 lowering; callers keep inputs in the compute
dtype and receive f32.

The backward pass is two dots of the same family per site (dh = t·dM over
X, dt = h·dM over F), done in a second kernel with the same grid.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_SITES = 8
VMEM_BUDGET = 10 * 2**20


def _dot(a, b, dims):
    return jax.lax.dot_general(
        a, b, (dims, ((), ())), preferred_element_type=jnp.float32
    )


def _fwd_kernel(h_ref, t_ref, o_ref):
    for s in range(_SITES):
        ht = h_ref[0, s]  # [K, F]
        tt = t_ref[0, s]  # [K, X]
        # [X, F] = Σ_k tt[k, x] · ht[k, f]; f32 accumulation in the dot,
        # emitted in the input dtype (a bf16 run would otherwise write the
        # model's largest temp at 2x width and re-convert it downstream)
        o_ref[0, s] = _dot(tt, ht, ((0,), (0,))).astype(o_ref.dtype)


def _bwd_kernel(h_ref, t_ref, dm_ref, dh_ref, dt_ref):
    for s in range(_SITES):
        ht = h_ref[0, s]  # [K, F]
        tt = t_ref[0, s]  # [K, X]
        dm = dm_ref[0, s]  # [X, F]
        dh_ref[0, s] = _dot(tt, dm, ((1,), (0,))).astype(dh_ref.dtype)  # over X
        dt_ref[0, s] = _dot(ht, dm, ((1,), (1,))).astype(dt_ref.dtype)  # over F


def pooled_m_supported(k, x, f):
    """Static gate: per-site-tile VMEM budget (the A axis is padded to the
    site tile internally, so any A works)."""
    vmem = _SITES * (k * f + k * x + 2 * x * f) * 4
    return k >= 1 and vmem < VMEM_BUDGET


def _pad_sites(t, a_pad):
    if a_pad:
        t = jnp.pad(t, ((0, 0), (0, a_pad)) + ((0, 0),) * (t.ndim - 2))
    return t


def _cost(ga, k, x, f, bwd):
    mult = 2 if bwd else 1
    return pl.CostEstimate(
        flops=mult * 2 * ga * k * x * f,
        bytes_accessed=(3 if bwd else 1) * 4 * ga * (k * f + k * x + x * f),
        transcendentals=0,
    )


def _specs(k, x, f, out):
    ins = [
        pl.BlockSpec((1, _SITES, k, f), lambda g, a: (g, a, 0, 0)),
        pl.BlockSpec((1, _SITES, k, x), lambda g, a: (g, a, 0, 0)),
    ]
    o = pl.BlockSpec((1, _SITES, x, f), lambda g, a: (g, a, 0, 0))
    return (ins, o) if out else ins


@jax.custom_vjp
def _pooled_m(h, tc):
    out, _ = _pm_fwd(h, tc)
    return out


def _pm_fwd(h, tc):
    g, a, k, f = h.shape
    x = tc.shape[-1]
    a_pad = (-a) % _SITES
    hp, tp = _pad_sites(h, a_pad), _pad_sites(tc, a_pad)
    ap = a + a_pad
    ins, o = _specs(k, x, f, True)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(g, ap // _SITES),
        in_specs=ins,
        out_specs=o,
        out_shape=jax.ShapeDtypeStruct((g, ap, x, f), h.dtype),
        cost_estimate=_cost(g * a, k, x, f, bwd=False),
        interpret=jax.default_backend() != "tpu",
    )(hp, tp)
    return out[:, :a], (h, tc)


def _pm_bwd(res, dm):
    h, tc = res
    g, a, k, f = h.shape
    x = tc.shape[-1]
    a_pad = (-a) % _SITES
    hp, tp = _pad_sites(h, a_pad), _pad_sites(tc, a_pad)
    dmp = _pad_sites(dm, a_pad)
    ap = a + a_pad
    ins, _ = _specs(k, x, f, True)
    dh, dt = pl.pallas_call(
        _bwd_kernel,
        grid=(g, ap // _SITES),
        in_specs=ins + [pl.BlockSpec((1, _SITES, x, f), lambda g, a: (g, a, 0, 0))],
        out_specs=[
            pl.BlockSpec((1, _SITES, k, f), lambda g, a: (g, a, 0, 0)),
            pl.BlockSpec((1, _SITES, k, x), lambda g, a: (g, a, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g, ap, k, f), h.dtype),
            jax.ShapeDtypeStruct((g, ap, k, x), tc.dtype),
        ],
        cost_estimate=_cost(g * a, k, x, f, bwd=True),
        interpret=jax.default_backend() != "tpu",
    )(hp, tp, dmp)
    return dh[:, :a], dt[:, :a]


_pooled_m.defvjp(_pm_fwd, _pm_bwd)


def pooled_m(h, tc):
    """M[g, a, x, f] = Σ_k h[g, a, k, f] · tc[g, a, k, x] (f32 out).

    h [G, A, K, F], tc [G, A, K, X] in any float dtype (bf16 keeps the MXU
    dots in bf16 with f32 accumulation; the output is emitted in h.dtype).
    Callers flatten trailing (c, i) axes of the CG×SH-contracted neighbor
    feature into X and reshape the output to [G, A, C, I, F].
    """
    return _pooled_m(h, tc)
