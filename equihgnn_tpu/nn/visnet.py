"""ViSNet: equivariant vector-scalar interactive message passing (dense, TPU).

Re-design of `reference equihgnn/models/layers/visnet_layer.py:15-1053`
(itself modified from torch_geometric's ViSNet). All computation runs in the
molecule-major dense layout [G, A, ...]: the `torch_cluster.radius_graph`
(`visnet_layer.py:290-352`) becomes a per-molecule k-nearest selection with a
radius mask — static shapes, O(G·A²) ranking, MXU-batched projections.

Replicated semantics:
  * edges include the self loop (radius_graph(loop=True)); self edges carry
    zero distance, zero direction vector, and are excluded from
    NeighborEmbedding (`visnet_layer.py:395-400`)
  * `ExpNormalSmearing` RBF with CosineCutoff (`visnet_layer.py:51-115`)
  * hand-rolled real spherical harmonics l ≤ 2 (`visnet_layer.py:118-193`)
  * `ViS_MP` runtime attention `silu(Σ q_i·k_j·dk) · cutoff(r_ij)`, vector
    rejection edge updates (`visnet_layer.py:472-679`); `ViS_MP_Vertex`
    variant (`:682-751`)
  * AtomEncoder consumes the OGB feature matrix as `z` (`visnet_layer.py:355-427`)
  * `EquivariantScalar` readout of two GatedEquivariantBlocks returning
    `x + v.sum()*0` (`visnet_layer.py:911-949`)
  * xavier-uniform/zero-bias init on all projections.

Documented deviation: torch_cluster's `max_num_neighbors` keeps the first k
neighbors in index order; we keep the k NEAREST (strictly better, same cap).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from equihgnn_tpu.nn.encoders import AtomEncoder
from equihgnn_tpu.ops import flop_tally
from equihgnn_tpu.ops.gather import nbr_gather
from equihgnn_tpu.ops.knn import knn_dense
from equihgnn_tpu.ops.numerics import safe_norm

_xavier = nn.initializers.xavier_uniform()


class _Proj(nn.Module):
    """Linear with xavier-uniform weight and zero bias (ViSNet convention)."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", _xavier, (x.shape[-1], self.features))
        y = jnp.dot(x, k.astype(x.dtype))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(y.dtype)
        return y


def cosine_cutoff(d, cutoff: float):
    """`visnet_layer.py:15-48`."""
    return 0.5 * (jnp.cos(d * math.pi / cutoff) + 1.0) * (d < cutoff)


class ExpNormalSmearing(nn.Module):
    """`visnet_layer.py:51-115`."""

    cutoff: float = 5.0
    num_rbf: int = 32
    trainable: bool = False

    def _initial(self):
        start = math.exp(-self.cutoff)
        means = np.linspace(start, 1.0, self.num_rbf).astype(np.float32)
        betas = np.full(
            self.num_rbf, (2.0 / self.num_rbf * (1.0 - start)) ** -2, np.float32
        )
        return means, betas

    @nn.compact
    def __call__(self, dist):
        means_0, betas_0 = self._initial()
        if self.trainable:
            means = self.param("means", lambda k: jnp.asarray(means_0))
            betas = self.param("betas", lambda k: jnp.asarray(betas_0))
        else:
            means, betas = jnp.asarray(means_0), jnp.asarray(betas_0)
        d = dist[..., None]
        alpha = 5.0 / self.cutoff
        return cosine_cutoff(d, self.cutoff) * jnp.exp(
            -betas * (jnp.exp(-alpha * d) - means) ** 2
        )


def spherical_harmonics_l2(vec, lmax: int = 2):
    """Real SH of unit vectors up to l=2, ViSNet convention
    (`visnet_layer.py:118-193`)."""
    x, y, z = vec[..., 0], vec[..., 1], vec[..., 2]
    sh1 = [x, y, z]
    if lmax == 1:
        return jnp.stack(sh1, axis=-1)
    s3 = math.sqrt(3.0)
    sh2 = [
        s3 * x * z,
        s3 * x * y,
        y * y - 0.5 * (x * x + z * z),
        s3 * y * z,
        s3 / 2.0 * (z * z - x * x),
    ]
    if lmax == 2:
        return jnp.stack(sh1 + sh2, axis=-1)
    raise ValueError(f"'lmax' needs to be 1 or 2 (got {lmax})")


class VecLayerNorm(nn.Module):
    """`visnet_layer.py:196-287`; default norm_type=None is a pure (fixed)
    channel weighting — identity for trainable=False."""

    hidden_channels: int
    trainable: bool = False
    norm_type: Optional[str] = None
    eps: float = 1e-12

    def _max_min(self, vec):
        # vec [..., L, C]
        dist = safe_norm(vec, axis=-2, keepdims=True)  # [..., 1, C]
        direct = vec / jnp.maximum(dist, self.eps)
        max_v = jnp.max(dist, axis=-1, keepdims=True)
        min_v = jnp.min(dist, axis=-1, keepdims=True)
        delta = max_v - min_v
        delta = jnp.where(delta == 0, 1.0, delta)
        nd = jax.nn.relu((dist - min_v) / delta)
        out = nd * direct
        all_zero = jnp.all(dist == 0, axis=(-2, -1), keepdims=True)
        return jnp.where(all_zero, 0.0, out)

    @nn.compact
    def __call__(self, vec):
        if self.trainable:
            w = self.param("weight", nn.initializers.ones, (self.hidden_channels,))
        else:
            w = jnp.ones((self.hidden_channels,))
        L = vec.shape[-2]
        if self.norm_type == "max_min":
            if L == 8:
                v1 = self._max_min(vec[..., :3, :])
                v2 = self._max_min(vec[..., 3:, :])
                vec = jnp.concatenate([v1, v2], axis=-2)
            else:
                vec = self._max_min(vec)
        return vec * w.astype(vec.dtype)


class ViS_MP(nn.Module):
    """Vector-scalar attention message passing (`visnet_layer.py:472-679`),
    dense [G, A, k] edge layout.

    TPU memory redesign (exact): the per-edge VECTOR tensors of the gather
    formulation ([G,A,k,L,h] — several GB each at batch 768, h=256) are never
    materialized. Vector aggregation goes through a one-hot neighbor matrix
    (A×A matmuls on the MXU): Σ_k vec[j(k)]·s1[k] = Σ_j (Σ_k 1[j(k)=j] s1[k])
    · vec[j]. The vector-rejection dot products expand algebraically:
    (u−(u·d)d)·(v−(v·d)d) = u·v − (u·d)(v·d)(2−|d|²), needing only
    [G,A,k,h]-sized per-edge tensors. Scalar messages keep the gather form.
    """

    num_heads: int
    hidden_channels: int
    cutoff: float
    vecnorm_type: Optional[str]
    trainable_vecnorm: bool
    last_layer: bool = False
    vertex: bool = False

    @nn.compact
    def __call__(
        self,
        x,  # [G, A, h]
        vec,  # [G, A, L, h]
        nbr_idx,  # [G, A, k] slot ids (j for each target i)
        nbr_mask,  # [G, A, k]
        r_ij,  # [G, A, k] distances
        f_ij,  # [G, A, k, h] edge scalars
        d_ij,  # [G, A, k, 8] SH of unit edge vectors (l≤2 components 0:3 = unit vec)
    ):
        h, nh = self.hidden_channels, self.num_heads
        hd = h // nh
        g, a, k = nbr_idx.shape
        gar = jnp.arange(g)[:, None, None]

        dt_in = x.dtype
        x = nn.LayerNorm(epsilon=1e-5, name="layernorm")(x).astype(dt_in)
        vec = VecLayerNorm(
            h, trainable=self.trainable_vecnorm, norm_type=self.vecnorm_type,
            name="vec_layernorm",
        )(vec)

        # keep everything in the fused [.., h=nh*hd] 128-lane-friendly layout;
        # [.., nh, hd] with hd=32 would pad the minor dim 32→128 (4× HBM)
        q = _Proj(h, name="q_proj")(x)
        kk = _Proj(h, name="k_proj")(x)
        v = _Proj(h, name="v_proj")(x)
        dk = nn.silu(_Proj(h, name="dk_proj")(f_ij))
        dv = nn.silu(_Proj(h, name="dv_proj")(f_ij))

        vec123 = _Proj(3 * h, use_bias=False, name="vec_proj")(vec)
        vec1, vec2, vec3 = jnp.split(vec123, 3, axis=-1)
        vec_dot = jnp.sum(vec1 * vec2, axis=-2)  # [G, A, h]

        # fused Pallas vector-interaction path (ops/pallas/vis_mix.py): the
        # per-l gather loops below materialize 16 [G,A,k,h] HBM temps per
        # layer — the kernel keeps them in VMEM (fusion_bytes.py attribution)
        from equihgnn_tpu.ops.pallas.vis_mix import (
            vis_mix_supported,
            vis_vector_mix,
        )

        use_mix_kernel = vis_mix_supported(a, k, vec.shape[2], h, x.dtype)
        if not use_mix_kernel:
            # one-hot neighbor matrix (masked): [G, A(i), k, A(j)]
            onehot = (
                (nbr_idx[..., None] == jnp.arange(a)[None, None, None, :])
                & nbr_mask[..., None]
            ).astype(x.dtype)

        # ---- message over neighbors (nbr_gather: matmul-transpose VJP,
        # no backward scatter — ops/gather.py)
        k_j = nbr_gather(kk, nbr_idx, nbr_mask)  # [G, A, k, h]
        v_j = nbr_gather(v, nbr_idx, nbr_mask)
        prod = q[:, :, None, :] * k_j * dk  # [G, A, k, h]
        attn = prod.reshape(g, a, k, nh, hd).sum(-1)  # per-head reduce only
        attn = nn.silu(attn) * cosine_cutoff(r_ij, self.cutoff).astype(
            attn.dtype
        )[..., None]
        attn = jnp.where(nbr_mask[..., None], attn, 0.0)  # [G, A, k, nh]
        attn_h = jnp.broadcast_to(
            attn[..., None], (g, a, k, nh, hd)
        ).reshape(g, a, k, h)

        v_j = v_j * dv * attn_h
        s12 = nn.silu(_Proj(2 * h, name="s_proj")(v_j))
        s1, s2 = jnp.split(s12, 2, axis=-1)
        mk = nbr_mask[..., None].astype(x.dtype)

        x_agg = jnp.sum(v_j * mk, axis=2)  # [G, A, h]
        if not self.last_layer:
            # edge update projections (`visnet_layer.py:546-553,660-667`):
            # w1·w2 with w1 = u−(u·d)d, w2 = v−(v·(−d))(−d) expands to
            # u·v − (u·d)(v·d)(2−|d|²); u at target i, v at source j.
            u = _Proj(h, use_bias=False, name="w_trg_proj")(vec)  # [G,A,L,h]
            vv = _Proj(h, use_bias=False, name="w_src_proj")(vec)

        # vec_agg = Σ_k vec[j(k)]·s1[k] + Σ_k s2[k]·d_ij[k]; w_dot = the
        # vector-rejection edge dot products. Fused path: one Pallas kernel
        # (ops/pallas/vis_mix.py) computes both with the gathers as one-hot
        # MXU matmuls entirely in VMEM.
        if use_mix_kernel:
            vec_agg, w_dot = vis_vector_mix(
                vec, s1, s2 * mk, d_ij, nbr_idx, nbr_mask,
                None if self.last_layer else u,
                None if self.last_layer else vv,
            )
        else:
            # XLA fallback: per-l neighbor gathers — each l slice is one
            # [A·k, A]×[A, h] matmul per molecule row, only [G,A,k,h]
            # transients (the earlier dense S=onehot·s1 [G,A,A,h] form ran
            # the MXU at ≤6%, PERF.md)
            vec_agg = jnp.stack(
                [
                    jnp.sum(
                        s1 * flop_tally.tally_einsum(
                            "gikj,gjh->gikh", onehot, vec[:, :, l]
                        ),
                        axis=2,
                    )
                    for l in range(vec.shape[2])
                ],
                axis=2,
            ) + jnp.einsum("gikh,gikl->gilh", s2 * mk, d_ij)
            if not self.last_layer:
                # Per-l gathers of the source projection feed BOTH the u·v
                # term and the (v·d) projection.
                uv = 0.0
                vd = 0.0
                for l in range(vec.shape[2]):
                    vvk_l = flop_tally.tally_einsum(
                        "gikj,gjh->gikh", onehot, vv[:, :, l]
                    )
                    uv = uv + u[:, :, None, l, :] * vvk_l
                    vd = vd + d_ij[..., l][..., None] * vvk_l
                ud = jnp.einsum("gilh,gikl->gikh", u, d_ij)
                dd = jnp.sum(d_ij * d_ij, axis=-1)[..., None]  # [G, A, k, 1]
                w_dot = uv - ud * vd * (2.0 - dd)

        o123 = _Proj(3 * h, name="o_proj")(x_agg)
        o1, o2, o3 = jnp.split(o123, 3, axis=-1)
        dx = vec_dot * o2 + o3
        dvec = vec3 * o1[..., None, :] + vec_agg

        if self.last_layer:
            return dx, dvec, None
        if not self.vertex:
            df_ij = nn.silu(_Proj(h, name="f_proj")(f_ij)) * w_dot
        else:
            # t1, t2 both use the TARGET vec (`visnet_layer.py:735-745`)
            p = _Proj(h, use_bias=False, name="t_trg_proj")(vec)
            qq = _Proj(h, use_bias=False, name="t_src_proj")(vec)
            pq = jnp.sum(p * qq, axis=-2)  # [G, A, h]
            pd = jnp.einsum("gilh,gikl->gikh", p, d_ij)
            qd = jnp.einsum("gilh,gikl->gikh", qq, d_ij)
            t_dot = pq[:, :, None] - pd * qd * (2.0 - dd)
            f12 = nn.silu(_Proj(2 * h, name="f_proj")(f_ij))
            f1, f2 = jnp.split(f12, 2, axis=-1)
            df_ij = f1 * w_dot + f2 * t_dot
        return dx, dvec, df_ij


class GatedEquivariantBlock(nn.Module):
    """torch_geometric's GatedEquivariantBlock (used by EquivariantScalar,
    `visnet_layer.py:911-949`)."""

    hidden_channels: int
    out_channels: int
    scalar_activation: bool = True

    @nn.compact
    def __call__(self, x, v):
        # x [..., h], v [..., L, h]
        vec1 = safe_norm(
            _Proj(self.hidden_channels, use_bias=False, name="vec1_proj")(v),
            axis=-2,
        )
        vec2 = _Proj(self.out_channels, use_bias=False, name="vec2_proj")(v)
        xin = jnp.concatenate([x, vec1], axis=-1)
        h = _Proj(self.hidden_channels, name="update_net_0")(xin)
        h = nn.silu(h)
        h = _Proj(2 * self.out_channels, name="update_net_1")(h)
        x_out, gate = jnp.split(h, 2, axis=-1)
        v_out = gate[..., None, :] * vec2
        if self.scalar_activation:
            x_out = nn.silu(x_out)
        return x_out, v_out


class ViSNet(nn.Module):
    """Top-level ViSNet (`visnet_layer.py:754-1053`): per-node scalars.

    Dense-layout API: callers pass flat (atom_feat, pos) + slot tables; the
    result is scattered back to the flat layout.
    """

    hidden_channels: int = 128
    lmax: int = 2
    vecnorm_type: Optional[str] = None
    trainable_vecnorm: bool = False
    num_heads: int = 8
    num_layers: int = 6
    num_rbf: int = 32
    trainable_rbf: bool = False
    cutoff: float = 5.0
    max_num_neighbors: int = 32
    vertex: bool = False
    std: float = 1.0
    remat_layers: Optional[bool] = None  # None: off iff the fused kernel runs
    dtype: str | None = None  # e.g. "bfloat16": layer-loop compute dtype

    @nn.compact
    def __call__(
        self,
        atom_feat,  # [N, 9] OGB features (consumed as `z`)
        pos,  # [N, 3]
        graph_id,  # [N] (row index with packed slot rows)
        slot_index,  # [R, A]
        slot_mask,  # [R, A]
        atom_slot,  # [N]
        slot_gid=None,  # [R, A] molecule id per slot (packed rows)
    ):
        h, L = self.hidden_channels, (self.lmax + 1) ** 2 - 1
        sm = slot_mask
        g_, a_ = sm.shape
        gar = jnp.arange(g_)[:, None, None]

        zf = atom_feat[slot_index]  # [G, A, 9]
        pd = pos[slot_index] * sm[..., None]

        # radius_graph(loop=True, cap 16) → k+1 nearest incl. self, radius mask
        nbr_idx, nbr_mask, sqd = knn_dense(
            pd, sm, self.max_num_neighbors + 1,
            valid_radius=self.cutoff, squared_radius=False, exclude_self=False,
            slot_gid=slot_gid,
        )
        r_ij = jnp.where(nbr_mask, jnp.sqrt(jnp.maximum(sqd, 0.0)), 0.0)
        pj = pd[gar, nbr_idx]
        edge_vec = pd[:, :, None, :] - pj  # i - j
        is_self = nbr_idx == jnp.arange(a_)[None, :, None]
        unit = edge_vec / safe_norm(edge_vec, axis=-1, keepdims=True)
        unit = jnp.where(is_self[..., None], edge_vec, unit)  # self stays 0
        d_ij = spherical_harmonics_l2(unit, self.lmax)  # [G, A, k, L]

        f_rbf = ExpNormalSmearing(
            self.cutoff, self.num_rbf, self.trainable_rbf, name="distance_expansion"
        )(r_ij)
        f_rbf = jnp.where(nbr_mask[..., None], f_rbf, 0.0)

        x = AtomEncoder(h, name="embedding")(zf)  # [G, A, h]
        x = x * sm[..., None]

        # NeighborEmbedding (`visnet_layer.py:355-427`): self edges excluded.
        # The reference NeighborEmbedding embeds z through its OWN AtomEncoder
        # (`visnet_layer.py:377,421`) — a second table, separate from the
        # trunk embedding (round-4 fix, found by CPU-torch golden capture).
        ne_mask = nbr_mask & ~is_self
        C = cosine_cutoff(r_ij, self.cutoff)
        W = _Proj(h, name="neighbor_distance_proj")(f_rbf) * C[..., None]
        x_src = AtomEncoder(h, name="neighbor_embedding")(zf) * sm[..., None]
        x_j = nbr_gather(x_src, nbr_idx, nbr_mask)
        x_nbr = jnp.sum(
            jnp.where(ne_mask[..., None], x_j * W, 0.0), axis=2
        )
        x = _Proj(h, name="neighbor_combine")(jnp.concatenate([x, x_nbr], -1))

        vec = jnp.zeros((g_, a_, L, h), x.dtype)
        # EdgeEmbedding (`visnet_layer.py:430-469`)
        x_jn = nbr_gather(x, nbr_idx, nbr_mask)
        f_ij = (x[:, :, None] + x_jn) * _Proj(h, name="edge_proj")(f_rbf)

        if self.dtype is not None:
            dt = jnp.dtype(self.dtype)
            x, vec, f_ij, d_ij = (
                t.astype(dt) for t in (x, vec, f_ij, d_ij)
            )

        # per-layer remat: backward recomputes the [G,A,k,·] edge tensors of
        # one layer at a time instead of saving six layers' worth (~16 GB at
        # batch 768 on a 16 GB chip). With the fused vis_mix kernels the
        # per-layer residuals are ~0.5 GB and skipping remat removes a full
        # forward recompute (428 -> 325 ms measured), so default to remat
        # only on the unfused path.
        from equihgnn_tpu.ops.pallas.vis_mix import vis_mix_supported

        remat_layers = self.remat_layers
        if remat_layers is None:
            remat_layers = not vis_mix_supported(
                a_, self.max_num_neighbors + 1, L, h, x.dtype
            )
        mp_cls = nn.remat(ViS_MP) if remat_layers else ViS_MP
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            dx, dvec, df = mp_cls(
                num_heads=self.num_heads,
                hidden_channels=h,
                cutoff=self.cutoff,
                vecnorm_type=self.vecnorm_type,
                trainable_vecnorm=self.trainable_vecnorm,
                last_layer=last,
                vertex=self.vertex,
                name=f"vis_mp_layers_{i}",
            )(x, vec, nbr_idx, nbr_mask, r_ij, f_ij, d_ij)
            x = x + dx
            vec = vec + dvec
            if not last:
                f_ij = f_ij + df

        x = nn.LayerNorm(epsilon=1e-5, name="out_norm")(x).astype(jnp.float32)
        vec = VecLayerNorm(
            h, trainable=self.trainable_vecnorm, norm_type=self.vecnorm_type,
            name="vec_out_norm",
        )(vec).astype(jnp.float32)

        # EquivariantScalar readout (`visnet_layer.py:911-949`)
        for i in range(2):
            x, vec = GatedEquivariantBlock(
                h, h, scalar_activation=True, name=f"output_network_{i}"
            )(x, vec)
        x = x + jnp.sum(vec) * 0.0
        x = x * self.std

        # back to flat layout
        return x[graph_id, atom_slot]
