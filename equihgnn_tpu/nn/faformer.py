"""FAFormer: frame-averaging transformer over molecular point clouds (dense, TPU).

Re-design of `reference equihgnn/models/layers/fa_former_layer.py:9-716`
(provenance Frame-Averaging-Transformer). Everything runs in the
molecule-major dense layout [G, A, ...]:

  * `FrameAveraging` (`fa_former_layer.py:61-120`): 2³ = 8 sign-flip frames
    from the eigenvectors of the (stop-gradient) covariance of centered
    coordinates — `jnp.linalg.eigh` on batched 3×3 matrices.
  * `EdgeModule` (`:340-400`): local frames over each atom's k-neighborhood
    radial coordinates, coord MLP on [frame coords ‖ squared norm], gated
    edge embeddings.
  * `MLPAttnEdgeAggregation` (`:403-573`): MLP attention over kNN with edge
    features; multi-head geometric aggregation done inside frame averaging to
    preserve equivariance; learnable gate residual on the coordinates.
  * `FAFFN` (`:293-337`): frame-averaged coordinate MLP fused into the FFN.
  * SwiGLU MLPs with an inner LayerNorm (`:245-290`).

Deviation (documented): the reference feeds the collated batch as ONE point
cloud (batch_idx all zero, `reference equihgnn/models/equihnn_fa_former.py:84`),
so global frames and kNN span molecules. We keep frames and neighborhoods
per-molecule — FAFormer's intended semantics with a real batch vector.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from equihgnn_tpu.nn.mlp import TorchLinear
from equihgnn_tpu.ops.gather import nbr_gather
from equihgnn_tpu.ops.eigh3 import eigh3x3
from equihgnn_tpu.ops.knn import knn_dense

# 8 sign-flip operations [8, 3] (`fa_former_layer.py:70-83`)
_SIGN_OPS = np.array(
    [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
    dtype=np.float32,
)


def _basis_vectors(cov, deg):
    """cov [..., 3, 3] (stop-gradient), deg [..., 1, 1] bool → eigvec
    [..., 3, 3] (columns = PCA eigenvectors; identity where degenerate)."""
    cov = jnp.where(deg, jnp.eye(3, dtype=cov.dtype), cov)
    # analytic 3x3 eigensolver: jnp.linalg.eigh's iterative lowering costs
    # ~82 ms per [24k,3,3] batch on the v5e and dominates the FAFormer step
    # (~10 calls); the closed form is pure VPU math (equihgnn_tpu/ops/eigh3.py)
    _, eigvec = eigh3x3(cov)  # [..., 3, 3], columns = eigenvectors
    return eigvec


def _sign_expand(eigvec):
    """eigvec [..., 3, 3] → F_ops [..., 8, 3, 3]: the 2³ sign flips.
    F_ops[..., o, i, j] = ops[o, j] * eigvec[..., i, j]."""
    ops = jnp.asarray(_SIGN_OPS)  # [8, 3]
    return ops[:, None, :] * eigvec[..., None, :, :]  # [..., 8, 3, 3]


def _frame_stats(coords, mask, slot_gid=None, num_graphs=None):
    """Shared frame statistics: masked centering, stop-gradient covariance,
    degeneracy gate, eigenbasis — the single source both `create_frame` and
    `create_frame_basis` build on (the fused SwiGLU kernel relies on their
    h[o, p, i] == s_o[i] · vbar[p, i] identity, so the statistics must never
    drift apart).

    Simple mode: (x_centered f32 [..., P, 3], eigvec [..., 3, 3],
    center [..., 3], None).
    Packed-row mode (slot_gid [R, P], num_graphs=B): per-MOLECULE statistics
    grouped through a one-hot [R, P, B] matmul (never a scatter) →
    (x [R, P, 3], eigvec_g [B, 3, 3], per-slot center [R, P, 3], ohg).
    """
    coords = coords.astype(jnp.float32)
    if slot_gid is None:
        m = mask[..., None].astype(jnp.float32)
        cnt = jnp.maximum(jnp.sum(m, axis=-2), 1.0)  # [..., 1]
        center = jnp.sum(coords * m, axis=-2) / cnt  # [..., 3]
        x = (coords - center[..., None, :]) * m  # masked centering
        cov = jax.lax.stop_gradient(jnp.einsum("...pi,...pj->...ij", x, x))
        deg = (jnp.sum(m, axis=(-2, -1)) < 0.5)[..., None, None]
        return x, _basis_vectors(cov, deg), center, None
    ohg = (
        (slot_gid[..., None] == jnp.arange(num_graphs)[None, None, :])
        & mask[..., None]
    ).astype(jnp.float32)  # [R, P, B]
    raw_cnt = jnp.einsum("rpb->b", ohg)  # [B] true atom count per molecule
    cnt = jnp.maximum(raw_cnt, 1.0)
    center_g = jnp.einsum("rpb,rpd->bd", ohg, coords) / cnt[:, None]
    center = jnp.einsum("rpb,bd->rpd", ohg, center_g)  # per-slot (0 at pad)
    x = (coords - center) * mask[..., None].astype(coords.dtype)
    cov_g = jax.lax.stop_gradient(jnp.einsum("rpb,rpi,rpj->bij", ohg, x, x))
    deg = (raw_cnt < 0.5)[:, None, None]
    return x, _basis_vectors(cov_g, deg), center, ohg


def create_frame(coords, mask, slot_gid=None, num_graphs=None):
    """Build the 8 PCA sign frames for each point set.

    coords [..., P, 3], mask [..., P] → (projected [..., 8, P, 3],
    F_ops [..., 8, 3, 3], center [..., 3]).  Gradients flow through the
    coordinates but not the eigenvectors (covariance is stop-gradient,
    `fa_former_layer.py:100-102`).

    Packed-row mode (slot_gid [R, P] molecule ids, -1 = pad; num_graphs=B):
    frame statistics are per MOLECULE (`_frame_stats`), and the returned
    F_ops/center are per SLOT: ([R, 8, P, 3], [R, P, 8, 3, 3], [R, P, 3]).
    `invert_frame` accepts both.
    """
    dt = coords.dtype
    x, eigvec, center, ohg = _frame_stats(coords, mask, slot_gid, num_graphs)
    if ohg is None:
        f_ops = _sign_expand(eigvec)
        # project: h[..., o, p, i] = Σ_j F_ops[..., o, j, i] x[..., p, j]
        h = jnp.einsum("...oji,...pj->...opi", f_ops, x)
        return h.astype(dt), f_ops, center
    f_ops = jnp.einsum("rpb,boij->rpoij", ohg, _sign_expand(eigvec))
    h = jnp.einsum("rpoji,rpj->ropi", f_ops, x)  # [R, 8, P, 3]
    return h.astype(dt), f_ops, center


def create_frame_basis(coords, mask, slot_gid=None, num_graphs=None):
    """Unsigned frame projection Vᵀ(coords − center) without the 8-frame
    expansion: `create_frame`'s h satisfies h[..., o, p, i] = s_o[i]·vbar[p, i],
    so frame-averaged MLP sites can feed vbar to the fused sign-expanding
    kernel (`ops/pallas/frame_swiglu.py`) instead of materializing h.

    coords [..., P, 3], mask [..., P] → (vbar [..., P, 3], center).
    Statistics and gradient semantics are `_frame_stats`'s — identical to
    `create_frame` by construction.
    """
    dt = coords.dtype
    x, eigvec, center, ohg = _frame_stats(coords, mask, slot_gid, num_graphs)
    if ohg is None:
        vbar = jnp.einsum("...ji,...pj->...pi", eigvec, x)
        return vbar.astype(dt), center
    ev = jnp.einsum("rpb,bji->rpji", ohg, eigvec)  # per-slot
    vbar = jnp.einsum("rpji,rpj->rpi", ev, x)
    return vbar.astype(dt), center


def invert_frame(x, mask, f_ops, center):
    """Average frame-local vectors back to the global frame
    (`fa_former_layer.py:114-120`). x [..., 8, P, 3] → [..., P, 3].

    With per-slot frames (f_ops [R, P, 8, 3, 3], center [R, P, 3] from the
    packed-row mode of `create_frame`), the averaging is per slot."""
    if f_ops.ndim == x.ndim + 1:  # per-slot frames (packed rows)
        out = jnp.einsum("rpoij,ropj->ropi", f_ops, x)
        out = jnp.mean(out, axis=-3) + center
    else:
        out = jnp.einsum("...oij,...opj->...opi", f_ops, x)
        out = jnp.mean(out, axis=-3)
        out = out + center[..., None, :]
    if mask is not None:
        out = out * mask[..., None].astype(out.dtype)
    return out.astype(x.dtype)


class _MLP(nn.Module):
    """MLPWrapper with activation in {gelu, silu, relu} (`:209-241`).

    ``mean_axis``: frame-averaged call sites (EdgeModule, FAFFN) take the
    mean over the 2³ sign-flip frames AFTER this MLP; the mean commutes with
    the affine fc2 (shared weights, bias averages to itself), so hoisting it
    between the halves computes the identical function (exactly, in eval or
    at drop=0) with 8× fewer fc2 FLOPs and 8× less [., 8, ., out] traffic —
    the dominant FAFormer cost on a device trace."""

    hidden: int
    out: int
    activation: str = "gelu"
    use_norm: bool = True
    drop: float = 0.0
    mean_axis: int | None = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        act = {"gelu": nn.gelu, "silu": nn.silu, "relu": nn.relu}[self.activation]
        dt = x.dtype
        x = TorchLinear(self.hidden, name="fc1")(x)
        x = act(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        if self.use_norm:
            x = nn.LayerNorm(epsilon=1e-5, name="norm")(x).astype(dt)
        if self.mean_axis is not None:
            x = jnp.mean(x, axis=self.mean_axis)
        x = TorchLinear(self.out, name="fc2")(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class _SwiGLU(nn.Module):
    """SwiGLU MLP with inner LayerNorm (`:245-290`)."""

    hidden: int
    out: int
    use_norm: bool = True
    drop: float = 0.0
    mean_axis: int | None = None  # see _MLP

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dt = x.dtype
        h = TorchLinear(self.hidden, name="fc1")(x)
        x1, x2 = jnp.split(h, 2, axis=-1)
        x = nn.silu(x1) * x2
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        if self.use_norm:
            x = nn.LayerNorm(epsilon=1e-5, name="norm")(x).astype(dt)
        if self.mean_axis is not None:
            x = jnp.mean(x, axis=self.mean_axis)
        x = TorchLinear(self.out, name="fc2")(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class _FrameSwiGLU(nn.Module):
    """Frame-averaged `_SwiGLU` evaluated without the 8-frame tensor.

    Input x [..., C]: columns 0..2 are the UNSIGNED frame projection from
    `create_frame_basis`, columns 3.. are frame-invariant features. The
    parameter tree (fc1/norm/fc2) is identical to `_SwiGLU`, so golden
    mappings and checkpoints are unaffected. On TPU (or with dropout
    inactive) the fc1→swiglu→dropout→LN→frame-mean chain runs in the fused
    Pallas kernel (`ops/pallas/frame_swiglu.py`); otherwise the frames are
    materialized with the same sign table and the chain runs in XLA.
    """

    hidden: int
    out: int
    drop: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from equihgnn_tpu.ops.pallas.frame_swiglu import (
            frame_swiglu_supported,
            fused_frame_swiglu,
        )

        dt = x.dtype
        c = x.shape[-1]
        hh = self.hidden // 2
        fc1 = TorchLinear(self.hidden, name="fc1")
        norm = nn.LayerNorm(epsilon=1e-5, name="norm")
        use_rng = (not deterministic) and self.drop > 0.0
        flat = x.reshape(-1, c)
        fused_ok = frame_swiglu_supported(flat.shape[0], c, self.hidden) and (
            not use_rng or jax.default_backend() == "tpu"
        )
        if fused_ok:
            _ = fc1(jnp.zeros((1, c), dt))
            _ = norm(jnp.zeros((1, hh), dt))
            p1 = fc1.variables["params"]
            pn = norm.variables["params"]
            seed = None
            if use_rng:
                seed = jax.lax.bitcast_convert_type(
                    jax.random.bits(self.make_rng("dropout"), (1,))[0],
                    jnp.int32,
                )
            y = fused_frame_swiglu(
                flat, p1["kernel"].astype(jnp.float32),
                p1["bias"].astype(jnp.float32),
                pn["scale"].astype(jnp.float32),
                pn["bias"].astype(jnp.float32),
                drop_rate=self.drop if use_rng else 0.0, seed=seed,
            )
            y = y.reshape(x.shape[:-1] + (hh,)).astype(dt)
        else:
            sgn = jnp.concatenate(
                [jnp.asarray(_SIGN_OPS), jnp.ones((8, c - 3), jnp.float32)],
                axis=-1,
            ).astype(dt)  # [8, C]
            h = fc1(x[..., None, :] * sgn)  # [..., 8, H]
            x1, x2 = jnp.split(h, 2, axis=-1)
            y = nn.silu(x1) * x2
            y = nn.Dropout(self.drop)(y, deterministic=deterministic)
            y = norm(y).astype(dt)
            y = jnp.mean(y, axis=-2)
        y = TorchLinear(self.out, name="fc2")(y)
        return nn.Dropout(self.drop)(y, deterministic=deterministic)


def _mlp(hidden, out, activation, drop, name, mean_axis=None):
    if activation == "swiglu":
        return _SwiGLU(hidden, out, drop=drop, name=name, mean_axis=mean_axis)
    return _MLP(
        hidden, out, activation=activation, drop=drop, name=name,
        mean_axis=mean_axis,
    )


class EdgeModule(nn.Module):
    """Local-frame edge features with attention gating (`:340-400`)."""

    d_model: int
    d_edge_model: int
    proj_drop: float = 0.0
    activation: str = "gelu"

    @nn.compact
    def __call__(self, token, geo, nbr_idx, nbr_mask, deterministic=True):
        # token [G, A, d], geo [G, A, 3], nbr_idx/nbr_mask [G, A, k]
        g, a, k = nbr_idx.shape
        gar = jnp.arange(g)[:, None, None]
        radial = geo[:, :, None, :] - nbr_gather(geo, nbr_idx, nbr_mask)
        radial_norm = jnp.sum(radial * radial, axis=-1, keepdims=True)

        # per-atom local frames over its neighborhood
        if self.activation == "swiglu":
            # unsigned basis only; the 2³ sign expansion happens inside the
            # fused kernel (never materialized — see _FrameSwiGLU)
            vbar, _ = create_frame_basis(radial, nbr_mask)  # [G, A, k, 3]
            frame_feats = _FrameSwiGLU(
                self.d_edge_model, self.d_edge_model, drop=self.proj_drop,
                name="coord_mlp",
            )(jnp.concatenate([vbar, radial_norm], -1), deterministic)
        else:
            frame_feats, _, _ = create_frame(radial, nbr_mask)  # [G,A,8,k,3]
            rn = jnp.broadcast_to(
                radial_norm[:, :, None], (g, a, 8, k, 1)
            )
            frame_feats = _mlp(
                self.d_edge_model, self.d_edge_model, self.activation,
                self.proj_drop, "coord_mlp", mean_axis=2,
            )(jnp.concatenate([frame_feats, rn], -1), deterministic)
        # [G, A, k, d_e]: frame mean hoisted before fc2 (see _MLP)

        pair = jnp.concatenate(
            [
                jnp.broadcast_to(token[:, :, None, :], (g, a, k, token.shape[-1])),
                nbr_gather(token, nbr_idx, nbr_mask),
            ],
            axis=-1,
        )
        pair = _mlp(
            self.d_model, self.d_model, self.activation, self.proj_drop, "edge_mlp"
        )(jnp.concatenate([pair, frame_feats], -1), deterministic)
        att = nn.sigmoid(TorchLinear(1, name="att_mlp")(pair))
        return pair * att


class FAFFN(nn.Module):
    """Frame-averaged coordinate features fused into the FFN (`:293-337`)."""

    d_model: int
    proj_drop: float = 0.0
    activation: str = "gelu"
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, token, geo, slot_mask, deterministic=True,
                 slot_gid=None, num_graphs=None):
        token = nn.LayerNorm(epsilon=1e-5, name="ln")(token).astype(token.dtype)
        if self.activation == "swiglu":
            vbar, _ = create_frame_basis(geo, slot_mask, slot_gid, num_graphs)
            h = _FrameSwiGLU(
                self.d_model, self.d_model, drop=self.proj_drop,
                name="W_frame",
            )(vbar, deterministic)
        else:
            frames, _, _ = create_frame(
                geo, slot_mask, slot_gid, num_graphs
            )  # [G, 8, A, 3]
            h = _mlp(
                self.d_model, self.d_model, self.activation, self.proj_drop,
                "W_frame", mean_axis=-3,
            )(frames, deterministic)
        # [G, A, d]: frame mean hoisted before fc2 (see _MLP)
        out = _mlp(
            int(self.d_model * self.mlp_ratio), self.d_model, self.activation,
            self.proj_drop, "ffn",
        )(jnp.concatenate([token, h], -1), deterministic)
        return out


class MLPAttnEdgeAggregation(nn.Module):
    """MLP attention + multi-head geometric aggregation (`:403-573`).

    Reference bug replicated by default (`faithful_frame_agg=False`): for
    n_heads>1 the reference gathers neighbor frame projections with
    un-offset flat indices (`fa_former_layer.py:540-548`), so every frame
    reads frame 0's rows; the per-frame context is then frame-constant, and
    averaging `F_op · const` over all 8 sign ops cancels to exactly zero —
    the coordinate update collapses to `center·gate + geo·(1−gate)`
    (verified to 7e-9 against CPU torch; tests/test_reference_goldens.py).
    `faithful_frame_agg=True` runs the equivariant aggregation the code
    intended."""

    d_model: int
    d_edge_model: int
    n_heads: int
    proj_drop: float = 0.0
    attn_drop: float = 0.0
    activation: str = "gelu"
    faithful_frame_agg: bool = False

    @nn.compact
    def __call__(
        self, token, geo, edge_feats, nbr_idx, nbr_mask, slot_mask,
        deterministic=True, slot_gid=None, num_graphs=None,
    ):
        d, de, nh = self.d_model, self.d_edge_model, self.n_heads
        dh, deh = d // nh, de // nh
        g, a, k = nbr_idx.shape
        gar = jnp.arange(g)[:, None, None]
        residual = token

        qkv = TorchLinear(3 * d, name="qkv_lin")(
            nn.LayerNorm(epsilon=1e-5, name="qkv_ln")(token).astype(token.dtype)
        )
        q_s, k_s, v_s = [
            t.reshape(g, a, nh, dh) for t in jnp.split(qkv, 3, axis=-1)
        ]
        qv_e = TorchLinear(2 * de, name="qkv_edge_lin")(
            nn.LayerNorm(epsilon=1e-5, name="qkv_edge_ln")(edge_feats).astype(edge_feats.dtype)
        )
        q_e, v_e = [
            t.reshape(g, a, k, nh, deh) for t in jnp.split(qv_e, 2, axis=-1)
        ]
        # W_gate init: weight=0, bias=1 → gate starts at σ(1) (`:446-448`)
        gate = nn.sigmoid(
            TorchLinear(
                1,
                kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.ones,
                name="W_gate",
            )(token)
        )

        # attention logits over neighbors
        message = q_s[:, :, None] + nbr_gather(k_s, nbr_idx, nbr_mask)
        attn = TorchLinear(1, use_bias=False, name="mlp_attn")(message)[..., 0]
        attn = attn + TorchLinear(1, use_bias=False, name="edge_attn")(q_e)[..., 0]
        attn = jnp.where(nbr_mask[..., None], attn.astype(jnp.float32), -1e9)
        attn = jax.nn.softmax(attn, axis=2).astype(v_e.dtype)  # over nbrs
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)

        v_nb = nbr_gather(v_s, nbr_idx, nbr_mask)  # [G, A, k, nh, dh]
        scalar_ctx = jnp.einsum("gakh,gakhd->gahd", attn, v_nb).reshape(g, a, d)
        edge_ctx = jnp.einsum("gakh,gakhd->gahd", attn, v_e).reshape(g, a, de)
        scalar_out = (
            _mlp(d, d, self.activation, self.proj_drop, "W_output")(
                jnp.concatenate([scalar_ctx, edge_ctx], -1), deterministic
            )
            + residual
        )

        if nh == 1:
            geo_nb = nbr_gather(geo, nbr_idx, nbr_mask)  # [G, A, k, 3]
            geo_ctx = jnp.einsum("gakh,gakd->gad", attn, geo_nb)
        elif not self.faithful_frame_agg:
            # reference-bug path (see class docstring): the multi-head
            # aggregation reduces to the per-molecule centroid
            mf = slot_mask[..., None].astype(jnp.float32)
            gf = geo.astype(jnp.float32)
            if slot_gid is None:
                cnt = jnp.maximum(jnp.sum(mf, axis=-2, keepdims=True), 1.0)
                center = jnp.sum(gf * mf, axis=-2, keepdims=True) / cnt
                geo_ctx = (jnp.broadcast_to(center, geo.shape) * mf).astype(
                    geo.dtype
                )
            else:
                ohg = (
                    (slot_gid[..., None] == jnp.arange(num_graphs)[None, None, :])
                    & slot_mask[..., None]
                ).astype(jnp.float32)  # [R, A, B]
                cnt = jnp.maximum(jnp.einsum("rab->b", ohg), 1.0)
                cg = jnp.einsum("rab,rad->bd", ohg, gf) / cnt[:, None]
                geo_ctx = jnp.einsum("rab,bd->rad", ohg, cg).astype(geo.dtype)
        else:
            # frame-averaged multi-head aggregation (`:510-567`)
            frames, f_ops, center = create_frame(
                geo, slot_mask, slot_gid, num_graphs
            )  # [G, 8, A, 3]
            # [G, 8, A, 3] gathered per (g, frame): fold the 8 frames
            # into the batch axis so the matmul-transpose VJP applies
            fr = frames.reshape(g * 8, a, 3)
            idx8 = jnp.broadcast_to(
                nbr_idx[:, None], (g, 8) + nbr_idx.shape[1:]
            ).reshape(g * 8, a, -1)
            m8 = jnp.broadcast_to(
                nbr_mask[:, None], (g, 8) + nbr_mask.shape[1:]
            ).reshape(g * 8, a, -1)
            geo_nb = nbr_gather(fr, idx8, m8).reshape(
                g, 8, a, -1, 3
            )  # [G, 8, A, k, 3]
            geo_ctx = jnp.einsum("gakh,gfakd->gfahd", attn, geo_nb)  # [G,8,A,nh,3]
            w = TorchLinear(1, name="W_frame_agg")(
                jnp.swapaxes(geo_ctx, -1, -2)  # [G,8,A,3,nh]
            )[..., 0]
            w = nn.silu(w)  # [G, 8, A, 3]
            geo_ctx = invert_frame(w, slot_mask, f_ops, center)  # [G, A, 3]

        geo_out = geo_ctx * gate + geo * (1.0 - gate)
        return scalar_out, geo_out


class FAFormerEncoderLayer(nn.Module):
    """`fa_former_layer.py:576-618`."""

    d_model: int
    d_edge_model: int
    n_heads: int
    proj_drop: float = 0.0
    attn_drop: float = 0.0
    activation: str = "gelu"
    faithful_frame_agg: bool = False

    @nn.compact
    def __call__(
        self, token, geo, edge_feats, nbr_idx, nbr_mask, slot_mask,
        deterministic=True, slot_gid=None, num_graphs=None,
    ):
        token, geo = MLPAttnEdgeAggregation(
            self.d_model, self.d_edge_model, self.n_heads,
            self.proj_drop, self.attn_drop, self.activation,
            faithful_frame_agg=self.faithful_frame_agg, name="self_attn",
        )(token, geo, edge_feats, nbr_idx, nbr_mask, slot_mask, deterministic,
          slot_gid, num_graphs)
        edge_feats = edge_feats + EdgeModule(
            self.d_model, self.d_edge_model, self.proj_drop, self.activation,
            name="edge_module",
        )(token, geo, nbr_idx, nbr_mask, deterministic)
        token = token + FAFFN(
            self.d_model, self.proj_drop, self.activation, name="ffn"
        )(token, geo, slot_mask, deterministic, slot_gid, num_graphs)
        return token, geo, edge_feats


class FAFormer(nn.Module):
    """Top-level FAFormer (`fa_former_layer.py:621-716`), dense layout.

    Input/output are flat [N, ...]; the dense view comes from the batch's
    slot tables. Returns updated (token_embs, coords) in the flat layout.
    """

    d_input: int = 64
    d_model: int = 64
    d_edge_model: int = 64
    n_layers: int = 3
    n_heads: int = 4
    n_neighbors: int = 16
    valid_radius: float = 1e6
    proj_drop: float = 0.1
    attn_drop: float = 0.1
    activation: str = "silu"
    faithful_frame_agg: bool = False  # True = intended equivariant agg

    @nn.compact
    def __call__(
        self,
        features,  # [N, d_input]
        coords,  # [N, 3]
        graph_id,  # [N] dense row per atom
        slot_index,  # [G, A]
        slot_mask,  # [G, A]
        atom_slot,  # [N]
        deterministic: bool = True,
        slot_gid=None,  # [R, A] molecule id per slot (packed rows)
        num_graphs: int | None = None,  # required with slot_gid
    ):
        sm = slot_mask
        g_, a_ = sm.shape

        token = TorchLinear(self.d_model, name="input_transform")(features)
        token = nn.Dropout(self.proj_drop)(token, deterministic=deterministic)
        td = token[slot_index] * sm[..., None]  # [G, A, d]
        geo = coords[slot_index] * sm[..., None]  # [G, A, 3]

        k = min(self.n_neighbors, a_)
        nbr_idx, nbr_mask, _ = knn_dense(
            geo, sm, k,
            valid_radius=self.valid_radius, squared_radius=False,
            exclude_self=True,  # `_build_graph` excludes self (`:651-656`)
            slot_gid=slot_gid,
        )

        edge_feats = EdgeModule(
            self.d_model, self.d_edge_model, self.proj_drop, self.activation,
            name="edge_module",
        )(td, geo, nbr_idx, nbr_mask, deterministic)
        for i in range(self.n_layers):
            td, geo, edge_feats = FAFormerEncoderLayer(
                self.d_model, self.d_edge_model, self.n_heads,
                self.proj_drop, self.attn_drop, self.activation,
                faithful_frame_agg=self.faithful_frame_agg,
                name=f"layers_{i}",
            )(td, geo, edge_feats, nbr_idx, nbr_mask, sm, deterministic,
              slot_gid, num_graphs)

        return td[graph_id, atom_slot], geo[graph_id, atom_slot]
