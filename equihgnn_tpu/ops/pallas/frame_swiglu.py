"""Pallas TPU kernel: fused frame-averaged SwiGLU for FAFormer.

FAFormer's frame-averaged MLPs (`reference equihgnn/models/layers/
fa_former_layer.py:245-337`) evaluate fc1 -> SwiGLU -> dropout -> LayerNorm
over all 2^3 = 8 sign-flip frames, then average the frames away before fc2.
The 8 frame inputs are just sign patterns of ONE projection: with
F_op[o,j,i] = s_o[i]·V[j,i] the frame coordinates are h_o = s_o ⊙ (Vᵀx), so
the whole [.., 8, .., hidden] pre-activation never needs to exist — per
position it is `base ± t_0 ± t_1 ± t_2` for three rank-1 VPU terms.

At the bench config (hidden 256, k = 16, batch 768 → P = R·A·k ≈ 244k
positions for EdgeModule's coord_mlp) the XLA lowering materializes the
[P, 8, 256] chain in HBM several times per train step (~2 GB f32 each);
a device trace put the chain at ~60 ms of a 130 ms FAFormer step. This
kernel reads [P, C] (C = 3 + #frame-invariant features) and writes
[P, hidden/2] — the 8-frame tensors live only in VMEM.

Grid: sequential tiles of P. Per tile:

    base = b1 + Σ_{c≥3} x[:,c]·w1[c,:]        # frame-invariant columns
    t_i  = x[:,i]·w1[i,:]                      # i < 3, rank-1
    for o in 8 sign patterns:                  # unrolled
        pre = base ± t_0 ± t_1 ± t_2
        y   = silu(pre[:, :H/2]) * pre[:, H/2:]
        y   = dropout(y)                       # in-kernel TPU PRNG
        acc += LayerNorm(y)·γ + β
    out = acc / 8

The backward kernel recomputes the chain in VMEM (rematerialization) and
regenerates the identical dropout mask by reseeding the per-tile PRNG with
the same (seed, program_id), accumulating parameter grads across the
sequential grid. Callers gate the dropout variant to the TPU backend (the
interpret-mode fallback used on CPU covers deterministic/drop=0 only).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# sign patterns, identical order to nn/faformer.py _SIGN_OPS
_SIGNS = [
    (sx, sy, sz) for sx in (-1.0, 1.0) for sy in (-1.0, 1.0) for sz in (-1.0, 1.0)
]

_LN_EPS = 1e-5
_TILE = 512
VMEM_BUDGET = 12 * 2**20


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _dsilu(x):
    s = jax.nn.sigmoid(x)
    return s * (1.0 + x * (1.0 - s))


def _drop_consts(drop_rate):
    # keep iff bits >= thresh: P(keep) = 1 - rate on uint32 lattice
    thresh = np.uint32(min(2**32 - 1, int(round(drop_rate * 2.0**32))))
    return thresh, np.float32(1.0 / (1.0 - drop_rate))


def _frame_pre_terms(x, w1, b1, c):
    """base (bias + frame-invariant columns) and the 3 signed rank-1 terms."""
    base = b1
    for j in range(3, c):
        base = base + x[:, j][:, None] * w1[j][None, :]
    t = [x[:, i][:, None] * w1[i][None, :] for i in range(3)]
    return base, t


def _fwd_kernel(x_ref, w1_ref, b1_ref, ls_ref, lb_ref, seed_ref, out_ref,
                *, hh, drop_rate):
    c = x_ref.shape[1]
    x = x_ref[...]
    w1 = w1_ref[...]
    base, t = _frame_pre_terms(x, w1, b1_ref[0][None, :], c)
    ls = ls_ref[0][None, :]
    lb = lb_ref[0][None, :]
    if drop_rate > 0.0:
        pltpu.prng_seed(seed_ref[0, 0], pl.program_id(0))
        thresh, inv_keep = _drop_consts(drop_rate)

    acc = jnp.zeros((x.shape[0], hh), jnp.float32)
    for sx, sy, sz in _SIGNS:
        pre = base + sx * t[0] + sy * t[1] + sz * t[2]
        y = _silu(pre[:, :hh]) * pre[:, hh:]
        if drop_rate > 0.0:
            bits = pltpu.bitcast(pltpu.prng_random_bits(y.shape), jnp.uint32)
            y = jnp.where(bits >= thresh, y * inv_keep, 0.0)
        mu = jnp.mean(y, axis=1, keepdims=True)
        d = y - mu
        var = jnp.mean(d * d, axis=1, keepdims=True)
        z = d * jax.lax.rsqrt(var + _LN_EPS)
        acc = acc + z * ls + lb
    out_ref[...] = acc * 0.125


def _bwd_kernel(x_ref, w1_ref, b1_ref, ls_ref, lb_ref, seed_ref, dout_ref,
                dx_ref, dw1_ref, db1_ref, dls_ref, dlb_ref, *, hh, drop_rate):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dls_ref[...] = jnp.zeros_like(dls_ref)
        dlb_ref[...] = jnp.zeros_like(dlb_ref)

    c = x_ref.shape[1]
    x = x_ref[...]
    w1 = w1_ref[...]
    base, t = _frame_pre_terms(x, w1, b1_ref[0][None, :], c)
    ls = ls_ref[0][None, :]
    if drop_rate > 0.0:
        pltpu.prng_seed(seed_ref[0, 0], pl.program_id(0))
        thresh, inv_keep = _drop_consts(drop_rate)

    dyn = dout_ref[...] * 0.125  # mean over the 8 frames
    dx = jnp.zeros_like(x)
    dw1_acc = jnp.zeros_like(w1)
    db1_acc = jnp.zeros((1, w1.shape[1]), jnp.float32)
    dls_acc = jnp.zeros((1, hh), jnp.float32)
    dlb_acc = jnp.zeros((1, hh), jnp.float32)

    for sx, sy, sz in _SIGNS:
        pre = base + sx * t[0] + sy * t[1] + sz * t[2]
        h1 = pre[:, :hh]
        h2 = pre[:, hh:]
        a1 = _silu(h1)
        y = a1 * h2
        if drop_rate > 0.0:
            bits = pltpu.bitcast(pltpu.prng_random_bits(y.shape), jnp.uint32)
            keep = bits >= thresh
            y = jnp.where(keep, y * inv_keep, 0.0)
        mu = jnp.mean(y, axis=1, keepdims=True)
        d = y - mu
        var = jnp.mean(d * d, axis=1, keepdims=True)
        inv = jax.lax.rsqrt(var + _LN_EPS)
        z = d * inv

        dlb_acc = dlb_acc + jnp.sum(dyn, axis=0, keepdims=True)
        dls_acc = dls_acc + jnp.sum(dyn * z, axis=0, keepdims=True)
        dz = dyn * ls
        dy = inv * (
            dz
            - jnp.mean(dz, axis=1, keepdims=True)
            - z * jnp.mean(dz * z, axis=1, keepdims=True)
        )
        if drop_rate > 0.0:
            dy = jnp.where(keep, dy * inv_keep, 0.0)
        dh1 = dy * h2 * _dsilu(h1)
        dh2 = dy * a1
        dpre = jnp.concatenate([dh1, dh2], axis=1)  # [tile, H]

        db1_acc = db1_acc + jnp.sum(dpre, axis=0, keepdims=True)
        # signs applied as static scalar multiplies on slices: Pallas kernels
        # may not capture array constants, and (sx, sy, sz) are Python floats.
        # When c == 3 there is no frame-invariant tail; Mosaic rejects the
        # zero-size m[3:] / g[:, 3:] slices, so the tail is gated statically.
        m = jnp.dot(x.T, dpre, preferred_element_type=jnp.float32)  # [C, H]
        m_parts = [sx * m[0:1], sy * m[1:2], sz * m[2:3]]
        if c > 3:
            m_parts.append(m[3:])
        dw1_acc = dw1_acc + jnp.concatenate(m_parts, axis=0)
        g = jnp.dot(dpre, w1.T, preferred_element_type=jnp.float32)  # [t, C]
        g_parts = [sx * g[:, 0:1], sy * g[:, 1:2], sz * g[:, 2:3]]
        if c > 3:
            g_parts.append(g[:, 3:])
        dx = dx + jnp.concatenate(g_parts, axis=1)

    dx_ref[...] = dx
    dw1_ref[...] = dw1_ref[...] + dw1_acc
    db1_ref[...] = db1_ref[...] + db1_acc
    dls_ref[...] = dls_ref[...] + dls_acc
    dlb_ref[...] = dlb_ref[...] + dlb_acc


def _tile_for(p):
    return min(_TILE, ((p + 7) // 8) * 8)


def frame_swiglu_supported(p, c, hidden):
    """Static shape gate with a VMEM budget check (falls back to XLA)."""
    if hidden % 2 or c < 3:
        return False
    tile = _tile_for(p)
    lanes_h = ((hidden + 127) // 128) * 128
    lanes_c = 128  # [tile, C] pads to a full lane tile
    vmem = tile * (8 * lanes_h + 2 * lanes_c) * 4 + 2 * (c + 2) * lanes_h * 4
    return vmem < VMEM_BUDGET


def _cost(p, c, h, hh, bwd):
    mult = 3 if bwd else 1
    return pl.CostEstimate(
        flops=mult * (2 * p * c * h + 8 * p * (6 * h + 13 * hh)),
        bytes_accessed=4 * (p * c + p * hh + 2 * c * h + 4 * hh) * (2 if bwd else 1),
        transcendentals=(2 if bwd else 1) * 8 * p * hh,
    )


def _pad_rows(x, tile):
    p = x.shape[0]
    pad = (-p) % tile
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x


def _common_specs(tile, c, h, hh):
    return [
        pl.BlockSpec((tile, c), lambda i: (i, 0)),
        pl.BlockSpec((c, h), lambda i: (0, 0)),
        pl.BlockSpec((1, h), lambda i: (0, 0)),
        pl.BlockSpec((1, hh), lambda i: (0, 0)),
        pl.BlockSpec((1, hh), lambda i: (0, 0)),
        pl.BlockSpec((1, 1), lambda i: (0, 0)),
    ]


def _prep(x, w1, b1, ls, lb, seed):
    if seed is None:
        seed = jnp.zeros((), jnp.int32)
    return (
        x.astype(jnp.float32), w1.astype(jnp.float32),
        b1.reshape(1, -1).astype(jnp.float32),
        ls.reshape(1, -1).astype(jnp.float32),
        lb.reshape(1, -1).astype(jnp.float32),
        seed.reshape(1, 1).astype(jnp.int32),
    )


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused(drop_rate, x, w1, b1, ls, lb, seed):
    out, _ = _vjp_fwd(drop_rate, x, w1, b1, ls, lb, seed)
    return out


def _vjp_fwd(drop_rate, x, w1, b1, ls, lb, seed):
    p, c = x.shape
    h = w1.shape[1]
    hh = h // 2
    tile = _tile_for(p)
    xp = _pad_rows(x, tile)
    out = pl.pallas_call(
        partial(_fwd_kernel, hh=hh, drop_rate=drop_rate),
        grid=(xp.shape[0] // tile,),
        in_specs=_common_specs(tile, c, h, hh),
        out_specs=pl.BlockSpec((tile, hh), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], hh), jnp.float32),
        cost_estimate=_cost(p, c, h, hh, bwd=False),
        interpret=jax.default_backend() != "tpu",
    )(*_prep(xp, w1, b1, ls, lb, seed))
    return out[:p].astype(x.dtype), (x, w1, b1, ls, lb, seed)


def _vjp_bwd(drop_rate, res, dout):
    x, w1, b1, ls, lb, seed = res
    p, c = x.shape
    h = w1.shape[1]
    hh = h // 2
    tile = _tile_for(p)
    xp = _pad_rows(x, tile)
    dop = _pad_rows(dout.astype(jnp.float32), tile)
    outs = pl.pallas_call(
        partial(_bwd_kernel, hh=hh, drop_rate=drop_rate),
        grid=(xp.shape[0] // tile,),
        in_specs=_common_specs(tile, c, h, hh)
        + [pl.BlockSpec((tile, hh), lambda i: (i, 0))],
        out_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0)),
            pl.BlockSpec((c, h), lambda i: (0, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
            pl.BlockSpec((1, hh), lambda i: (0, 0)),
            pl.BlockSpec((1, hh), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((xp.shape[0], c), jnp.float32),
            jax.ShapeDtypeStruct((c, h), jnp.float32),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
            jax.ShapeDtypeStruct((1, hh), jnp.float32),
            jax.ShapeDtypeStruct((1, hh), jnp.float32),
        ],
        cost_estimate=_cost(p, c, h, hh, bwd=True),
        interpret=jax.default_backend() != "tpu",
    )(*_prep(xp, w1, b1, ls, lb, seed), dop)
    dx, dw1, db1, dls, dlb = outs
    return (
        dx[:p].astype(x.dtype), dw1.astype(w1.dtype),
        db1.reshape(b1.shape).astype(b1.dtype),
        dls.reshape(ls.shape).astype(ls.dtype),
        dlb.reshape(lb.shape).astype(lb.dtype),
        None,
    )


_fused.defvjp(_vjp_fwd, _vjp_bwd)


def fused_frame_swiglu(x, w1, b1, ls, lb, *, drop_rate=0.0, seed=None):
    """mean_o LN(dropout(swiglu((s_o ⊙ x[:, :3] ‖ x[:, 3:]) @ w1 + b1)))·γ+β.

    x [P, C] with columns 0..2 the unsigned frame projection Vᵀ(pos−center)
    and columns 3.. frame-invariant features; w1 [C, H], b1 [H] the fc1
    parameters; ls/lb [H/2] the inner LayerNorm scale/bias. Returns
    [P, H/2] in x.dtype (compute in f32). `drop_rate` must be a static
    float; dropout (rate > 0) requires the TPU backend and a traced int32
    `seed` (the mask is regenerated in the backward pass from the same
    seed).
    """
    if drop_rate > 0.0 and jax.default_backend() != "tpu":
        raise NotImplementedError(
            "in-kernel dropout uses the TPU PRNG; gate callers on backend"
        )
    return _fused(float(drop_rate), x, w1, b1, ls, lb, seed)
