"""Pallas TPU kernel: fused EGNN edge-message MLP over dense neighborhoods.

The flagship EGNN step is memory-bound on its edge pre-activation: with the
reference config (hidden 256 → F = 2·(2·256+1) = 1026 edge-MLP features,
k = 16 neighbors) the [R, A, k, F] tensor is ~1 GB at batch 768, and the XLA
lowering materializes it in HBM four times per step (gather+broadcast-add
write, bf16 cast for the second matmul, and two backward reads) — 56% of the
step in a device trace (PERF.md round 4).

This kernel computes, per molecule row r (sequential TPU grid) and neighbor
slot kk (unrolled static loop, all tiles 2-D [A, F] — Mosaic-friendly):

    pre_kk = ui + OneHot(idx[:, kk]) @ ujn + dist[:, kk]·w_d + b0
    out_kk = silu(silu(pre_kk) @ W1 + b1)          # [A, m]

entirely in VMEM — the F-wide tensors never touch HBM. The backward kernel
recomputes `pre` in VMEM (rematerialization) and produces all input and
parameter gradients, accumulating parameter grads across the sequential grid
(same revisiting-output pattern as segment_sum.py).

Semantics are identical to the unfused composition in `nn/egnn.py`
(`reference equihgnn/models/layers/egnn_layer.py:305-310`: edge_mlp =
[Linear, Dropout, SiLU, Linear, SiLU] with dropout 0); callers must gate on
dropout == 0. A static VMEM budget check falls back to the XLA composition.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _dsilu(x):
    s = jax.nn.sigmoid(x)
    return s * (1.0 + x * (1.0 - s))


def _onehot_k(idx, kk, a):
    """[A, A] selection matrix for neighbor slot kk: row a -> idx[a, kk]."""
    cols = jax.lax.broadcasted_iota(jnp.int32, (a, a), 1)
    return (cols == idx[:, kk][:, None]).astype(jnp.float32)


def _dot(x, y, mm_bf16=False):
    """MXU matmul, f32 accumulation. On the sub-f32 activation path the
    operands are cast to bf16 (exact re-casts of bf16 data; f32 operands
    run the v5e MXU in multi-pass emulation — the kernel measured 7.5 ms
    of the 18.7 ms egnn step before this gate, PERF.md round 5)."""
    if mm_bf16:
        return jnp.dot(
            x.astype(jnp.bfloat16), y.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
    return jnp.dot(x, y, preferred_element_type=jnp.float32)


def _fwd_kernel(mm_bf16, ui_ref, ujn_ref, dist_ref, idx_ref, wd_ref, b0_ref,
                w1_ref, b1_ref, out_ref):
    a, k = idx_ref.shape[1], idx_ref.shape[2]
    ui = ui_ref[0]
    ujn = ujn_ref[0]
    idx = idx_ref[0]
    base = ui + b0_ref[0][None, :]
    for kk in range(k):
        pre = (
            base
            + _dot(_onehot_k(idx, kk, a), ujn, mm_bf16)
            + dist_ref[0][:, kk][:, None] * wd_ref[0][None, :]
        )
        z = _dot(_silu(pre), w1_ref[:, :], mm_bf16) + b1_ref[0][None, :]
        out_ref[0, kk] = _silu(z)


def _bwd_kernel(mm_bf16, ui_ref, ujn_ref, dist_ref, idx_ref, wd_ref, b0_ref,
                w1_ref, b1_ref, dm_ref,
                dui_ref, dujn_ref, ddist_ref, dwd_ref, db0_ref, dw1_ref,
                db1_ref):
    g = pl.program_id(0)
    a, k = idx_ref.shape[1], idx_ref.shape[2]

    @pl.when(g == 0)
    def _():
        dwd_ref[0] = jnp.zeros_like(dwd_ref[0])
        db0_ref[0] = jnp.zeros_like(db0_ref[0])
        dw1_ref[:, :] = jnp.zeros_like(dw1_ref)
        db1_ref[0] = jnp.zeros_like(db1_ref[0])

    ui = ui_ref[0]
    ujn = ujn_ref[0]
    idx = idx_ref[0]
    wd = wd_ref[0][None, :]
    base = ui + b0_ref[0][None, :]

    dui = jnp.zeros_like(ui)
    dujn = jnp.zeros_like(ujn)
    dwd_acc = jnp.zeros_like(wd)
    db0_acc = jnp.zeros((1, ui.shape[1]), jnp.float32)
    dw1_acc = jnp.zeros_like(dw1_ref)
    db1_acc = jnp.zeros((1, dm_ref.shape[-1]), jnp.float32)

    for kk in range(k):
        oh = _onehot_k(idx, kk, a)
        dist_col = dist_ref[0][:, kk][:, None]
        pre = base + _dot(oh, ujn, mm_bf16) + dist_col * wd
        a1 = _silu(pre)
        z = _dot(a1, w1_ref[:, :], mm_bf16) + b1_ref[0][None, :]
        dm = dm_ref[0, kk]  # [A, m]
        dz = dm * _dsilu(z)
        dw1_acc = dw1_acc + _dot(a1.T, dz, mm_bf16)
        db1_acc = db1_acc + jnp.sum(dz, axis=0, keepdims=True)
        dpre = _dot(dz, w1_ref[:, :].T, mm_bf16) * _dsilu(pre)
        db0_acc = db0_acc + jnp.sum(dpre, axis=0, keepdims=True)
        dwd_acc = dwd_acc + jnp.sum(dpre * dist_col, axis=0, keepdims=True)
        ddist_ref[0, kk] = jnp.sum(dpre * wd, axis=1, keepdims=True)
        dui = dui + dpre
        dujn = dujn + _dot(oh.T, dpre, mm_bf16)

    dui_ref[0] = dui
    dujn_ref[0] = dujn
    dwd_ref[0] = dwd_ref[0] + dwd_acc[0]
    db0_ref[0] = db0_ref[0] + db0_acc[0]
    dw1_ref[:, :] = dw1_ref[:, :] + dw1_acc
    db1_ref[0] = db1_ref[0] + db1_acc[0]


# VMEM budget: ui/ujn/dui/dujn [A, F] tiles + W1 blocks + ~2 live tiles per
# UNROLLED k iteration — Mosaic's stack allocator keeps unrolled-loop temps
# live (measured: a=200, k=16, F=1026 allocated 31.2 MB against the 16 MB
# scope; the old 8-tile model predicted 8.6 MB and wrongly admitted it —
# found by the Molecule3D-size large-A validation, SCALE.md round 5).
VMEM_BUDGET = 12 * 2**20


def _supported(a, k, f, m):
    lanes_f = ((f + 127) // 128) * 128
    tile = a * lanes_f * 4
    return (8 + 2 * k) * tile + 2 * lanes_f * max(m, 128) * 4 < VMEM_BUDGET


def _xla_forward(ui, ujn, dist, nbr_idx, wd, b0, w1, b1):
    g = jnp.arange(ujn.shape[0])[:, None, None]
    uj = ujn[g, nbr_idx]  # [G, A, k, F]
    pre = ui[:, :, None, :] + uj + dist[..., None] * wd + b0
    return _silu(jnp.einsum("gakf,fm->gakm", _silu(pre), w1) + b1)


def fused_edge_messages(ui, ujn, dist, nbr_idx, wd, b0, w1, b1):
    """silu(silu(ui ⊕ gather(ujn) + dist·wd + b0) @ w1 + b1) → [G, A, k, m].

    ui/ujn [G, A, F] node-side pre-projections, dist [G, A, k] squared
    distances, nbr_idx [G, A, k] slot indices, wd/b0 [F], w1 [F, m], b1 [m].
    """
    g, a, f = ui.shape
    k = nbr_idx.shape[-1]
    m = w1.shape[-1]
    if not _supported(a, k, f, m):
        return _xla_forward(ui, ujn, dist, nbr_idx, wd, b0, w1, b1)
    return _fused(ui, ujn, dist, nbr_idx, wd, b0, w1, b1)


@jax.custom_vjp
def _fused(ui, ujn, dist, nbr_idx, wd, b0, w1, b1):
    out, _ = _vjp_fwd(ui, ujn, dist, nbr_idx, wd, b0, w1, b1)
    return out


def _fwd_impl(ui, ujn, dist, nbr_idx, wd, b0, w1, b1):
    g, a, f = ui.shape
    k = nbr_idx.shape[-1]
    m = w1.shape[-1]
    out = pl.pallas_call(
        partial(_fwd_kernel, jnp.dtype(ui.dtype) != jnp.float32),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, a, f), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, a, f), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, a, k), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, a, k), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, f), lambda i: (0, 0)),
            pl.BlockSpec((1, f), lambda i: (0, 0)),
            pl.BlockSpec((f, m), lambda i: (0, 0)),
            pl.BlockSpec((1, m), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, k, a, m), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((g, k, a, m), jnp.float32),
        # surface the kernel's algebraic FLOPs to XLA's cost analysis so
        # bench MFU accounting sees the fused matmul (2·E·f·m) it replaced
        cost_estimate=pl.CostEstimate(
            flops=2 * g * a * k * f * m + 8 * g * a * k * f,
            bytes_accessed=4 * g * a * (2 * f + k * (2 + m)) + 4 * f * m,
            transcendentals=2 * g * a * k * (f + m),
        ),
        interpret=jax.default_backend() != "tpu",
    )(
        ui.astype(jnp.float32), ujn.astype(jnp.float32),
        dist.astype(jnp.float32), nbr_idx.astype(jnp.int32),
        wd.reshape(1, f).astype(jnp.float32),
        b0.reshape(1, f).astype(jnp.float32),
        w1.astype(jnp.float32), b1.reshape(1, m).astype(jnp.float32),
    )
    return jnp.swapaxes(out, 1, 2).astype(ui.dtype)  # [G, A, k, m]


def _vjp_fwd(ui, ujn, dist, nbr_idx, wd, b0, w1, b1):
    out = _fwd_impl(ui, ujn, dist, nbr_idx, wd, b0, w1, b1)
    return out, (ui, ujn, dist, nbr_idx, wd, b0, w1, b1)


def _vjp_bwd(res, dm):
    ui, ujn, dist, nbr_idx, wd, b0, w1, b1 = res
    g, a, f = ui.shape
    k = nbr_idx.shape[-1]
    m = w1.shape[-1]
    outs = pl.pallas_call(
        partial(_bwd_kernel, jnp.dtype(ui.dtype) != jnp.float32),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, a, f), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, a, f), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, a, k), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, a, k), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, f), lambda i: (0, 0)),
            pl.BlockSpec((1, f), lambda i: (0, 0)),
            pl.BlockSpec((f, m), lambda i: (0, 0)),
            pl.BlockSpec((1, m), lambda i: (0, 0)),
            pl.BlockSpec((1, k, a, m), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, a, f), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, a, f), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, k, a, 1), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, f), lambda i: (0, 0)),
            pl.BlockSpec((1, f), lambda i: (0, 0)),
            pl.BlockSpec((f, m), lambda i: (0, 0)),
            pl.BlockSpec((1, m), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g, a, f), jnp.float32),
            jax.ShapeDtypeStruct((g, a, f), jnp.float32),
            jax.ShapeDtypeStruct((g, k, a, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
            jax.ShapeDtypeStruct((f, m), jnp.float32),
            jax.ShapeDtypeStruct((1, m), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=3 * (2 * g * a * k * f * m) + 16 * g * a * k * f,
            bytes_accessed=4 * g * a * (4 * f + k * (3 + 2 * m)) + 8 * f * m,
            transcendentals=2 * g * a * k * (f + m),
        ),
        interpret=jax.default_backend() != "tpu",
    )(
        ui.astype(jnp.float32), ujn.astype(jnp.float32),
        dist.astype(jnp.float32), nbr_idx.astype(jnp.int32),
        wd.reshape(1, f).astype(jnp.float32),
        b0.reshape(1, f).astype(jnp.float32),
        w1.astype(jnp.float32), b1.reshape(1, m).astype(jnp.float32),
        jnp.swapaxes(dm, 1, 2).astype(jnp.float32),
    )
    dui, dujn, ddist, dwd, db0, dw1, db1 = outs
    return (
        dui.astype(ui.dtype), dujn.astype(ujn.dtype),
        jnp.swapaxes(ddist[..., 0], 1, 2).astype(dist.dtype),
        None,
        dwd.reshape(f).astype(wd.dtype), db0.reshape(f).astype(b0.dtype),
        dw1.astype(w1.dtype), db1.reshape(m).astype(b1.dtype),
    )


_fused.defvjp(_vjp_fwd, _vjp_bwd)
