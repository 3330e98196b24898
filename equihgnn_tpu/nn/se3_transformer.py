"""SE(3)-Transformer: TFN-convolution attention over molecular point clouds.

Re-design of `reference equihgnn/models/layers/se3_transformer_layer.py:42-1693`
(+ `se3_transformer/basis.py`, provenance lucidrains/se3-transformer-pytorch).
Features are fibers {degree: [..., channels, 2·degree+1]} in the molecule-major
dense layout.

TPU-first decision (documented deviation): the reference computes the
equivariant kernel per forward from spherical harmonics × disk-cached Q_J
matrices with chunked accumulation to bound GPU memory
(`se3_transformer_layer.py:238-308`, `basis.py:193-252`). Here the TFN kernel
is a direct contraction
    K(r)[o·mo, i·mi] = Σ_J R_J(‖r‖)[o,i] · Σ_mJ CG^{(din,J,dout)}[mi,mJ,mo] Y_J(r̂)[mJ]
with host-precomputed CG tensors and runtime SH — no chunking needed; XLA
fuses the einsums and the O(G·A·k) tensors are small in the dense layout.

Replicated semantics: per-degree LinearSE3 (`:104-119`), norm-gated NormSE3
nonlinearity with GELU (`:122-184`), ConvSE3 with per-frequency RadialFunc
[Lin-LN-GELU]×2-Lin(mid 128) and masked-mean pooling + self-interaction
residual (`:187-377`), AttentionSE3 with ConvSE3 keys/values, LinearSE3
queries and self-attend keys/values joined on the neighbor axis (`:415-608`),
pre-norm residual attention + FFN blocks (`:380-409,791-845`), exclude-self
kNN with radius mask, type-0 output (output_degrees=1 → return_type 0).
"""

from __future__ import annotations

from functools import lru_cache
from math import sqrt

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from equihgnn_tpu.nn.mlp import TorchLinear
from equihgnn_tpu.ops.knn import knn_dense
from equihgnn_tpu.ops.sh import spherical_harmonics
from equihgnn_tpu.ops.numerics import safe_norm
from equihgnn_tpu.ops.so3 import real_clebsch_gordan

Fiber = tuple


@lru_cache(maxsize=None)
def _cg(l1: int, l2: int, l3: int) -> np.ndarray:
    return real_clebsch_gordan(l1, l2, l3).astype(np.float32)


class LinearSE3(nn.Module):
    """`se3_transformer_layer.py:104-119`."""

    fiber_in: Fiber
    fiber_out: Fiber

    @nn.compact
    def __call__(self, x: dict) -> dict:
        out = {}
        for degree, dim_in in enumerate(self.fiber_in):
            if degree >= len(self.fiber_out):
                continue
            dim_out = self.fiber_out[degree]
            w = self.param(
                f"w{degree}",
                nn.initializers.normal(stddev=1.0 / sqrt(dim_in)),
                (dim_in, dim_out),
            )
            out[degree] = jnp.einsum("...dm,de->...em", x[degree], w)
        return out


class NormSE3(nn.Module):
    """Norm-gated nonlinearity (`se3_transformer_layer.py:122-184`)."""

    fiber: Fiber
    eps: float = 1e-12
    use_gelu: bool = True

    @nn.compact
    def __call__(self, x: dict) -> dict:
        out = {}
        for degree, chan in enumerate(self.fiber):
            t = x[degree]
            norm = jnp.maximum(
                safe_norm(t, axis=-1, keepdims=True), self.eps
            )
            phase = t / norm
            scale = self.param(f"scale{degree}", nn.initializers.ones, (chan,))
            transformed = norm[..., 0] * scale
            if self.use_gelu:
                transformed = nn.gelu(transformed)
            out[degree] = transformed[..., None] * phase
        return out


class RadialTrunkSE3(nn.Module):
    """Radial hidden (`se3_transformer_layer.py:311-336` minus the final
    projection, which `ConvSE3` applies in factorized form — see below)."""

    mid_dim: int = 128

    @nn.compact
    def __call__(self, rel_dist):
        h = TorchLinear(self.mid_dim, name="lin0")(rel_dist)
        h = nn.gelu(nn.LayerNorm(name="ln0")(h))
        h = TorchLinear(self.mid_dim, name="lin1")(h)
        h = nn.gelu(nn.LayerNorm(name="ln1")(h))
        return h


def _radial_proj_params(mdl, name, f, nc_out, nc_in, num_freq):
    """Final RadialFunc projection W [f, o, i, J], b [o, i, J] (torch Linear
    init, fan_in = f) — never materialized as a per-edge matrix."""
    bound = 1.0 / sqrt(f)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    W = mdl.param(f"{name}_W", init, (f, nc_out, nc_in, num_freq))
    b = mdl.param(f"{name}_b", init, (nc_out, nc_in, num_freq))
    return W, b


def _dense_h(h, nbr_idx, nbr_mask):
    """Scatter per-edge radial hiddens into the dense neighbor matrix:
    hd[g,i,j,f] = Σ_k 1[nbr(i,k)=j]·h[g,i,k,f] — exact because kNN neighbor
    lists contain each j at most once. A one-hot MXU matmul, no gathers."""
    g, a, k, f = h.shape
    onehot = (
        (nbr_idx[..., None] == jnp.arange(a)[None, None, None, :])
        & nbr_mask[..., None]
    ).astype(h.dtype)
    return jnp.einsum("gikj,gikf->gijf", onehot, h)


class ConvSE3(nn.Module):
    """TFN convolution (`se3_transformer_layer.py:187-308`), direct CG×SH.

    TPU memory/FLOP redesign (exact, mirrors `equihgnn_tpu/nn/equiformer.py`):
    the reference materializes the per-edge kernel matrix R(dist) [o, i, J]
    — tens of GB and petaFLOPs at fiber 256 / batch 768. Instead, with
    R_J = W_J·h + b_J (h = radial hidden, f=128):

      * pool=True: the neighbor mean commutes with W_J — contract h against
        neighbors first (M_J[n,f,i,c] = Σ_k h[k,f]·t_J[k,i,c]), then apply
        W_J once per node.
      * pool=False: apply W_J to the NODE features first
        (u_J[n,f,o,a] = Σ_i W_J[f,o,i]·x[n,i,a] — N-side, 16× fewer sites
        than edges), gather u at neighbors and contract with h per edge in
        k-chunks, then CG×SH.
    """

    fiber_in: Fiber
    fiber_out: Fiber
    self_interaction: bool = True
    pool: bool = True
    radial_mid_dim: int = 128

    @nn.compact
    def __call__(
        self,
        inp: dict,  # {degree: [G, A, dim, 2d+1]}
        nbr_idx,
        nbr_mask,
        rel_dist,  # [G, A, k, 1]
        sh,  # list of [G, A, k, 2J+1]
    ) -> dict:
        g, a, k = nbr_idx.shape
        gar = jnp.arange(g)[:, None, None]
        f = self.radial_mid_dim
        inc = nbr_mask[..., None, None]

        cnt = jnp.maximum(
            jnp.sum(nbr_mask.astype(jnp.float32), axis=2), 1.0
        )[..., None, None]

        outputs = {}
        for dout, nc_out in enumerate(self.fiber_out):
            acc = None
            for din, nc_in in enumerate(self.fiber_in):
                js = list(range(abs(din - dout), din + dout + 1))
                h = RadialTrunkSE3(f, name=f"radial_{din}_{dout}")(rel_dist)
                h = jnp.where(nbr_mask[..., None], h, 0.0)  # [G, A, k, f]
                W, b = _radial_proj_params(
                    self, f"radial_{din}_{dout}_out", f, nc_out, nc_in, len(js)
                )
                xn = inp[din]  # [G, A, nc_in, 2din+1]

                term = None
                if self.pool:
                    # per-(J, c) checkpoint: each unit's M[·, f, i] temp
                    # (~GBs at fiber 256) lives alone and is recomputed in
                    # backward instead of coexisting across J/c
                    @jax.checkpoint
                    def one_pooled(Wj, bj, Qc, shj, h=h, xn=xn):
                        xg = jnp.where(inc, xn[gar, nbr_idx], 0.0)
                        tc = jnp.einsum("bm,gakib,gakm->gaki", Qc, xg, shj)
                        M = jnp.einsum("gakf,gaki->gafi", h, tc)
                        return jnp.einsum("foi,gafi->gao", Wj, M) + jnp.einsum(
                            "oi,gai->gao", bj, jnp.sum(tc, axis=2)
                        )

                    for jidx, J in enumerate(js):
                        Q = jnp.asarray(_cg(din, J, dout))
                        cs = [
                            one_pooled(W[..., jidx], b[..., jidx], Q[:, :, c], sh[J])
                            for c in range(Q.shape[2])
                        ]
                        contrib = jnp.stack(cs, axis=-1) / cnt
                        term = contrib if term is None else term + contrib
                else:
                    hd = _dense_h(h, nbr_idx, nbr_mask)  # [G, A, A, f]

                    # per-J checkpoint: u [N, f, o, b] (≤1.7 GB) and the
                    # dense mix live one J at a time, recomputed in backward
                    @jax.checkpoint
                    def one_j(Wj, bj, Q, shj, hd=hd, xn=xn):
                        u = jnp.einsum("foi,gjib->gjfob", Wj, xn)
                        v_dense = jnp.einsum("gijf,gjfob->gijob", hd, u)
                        vk = jnp.take_along_axis(
                            v_dense, nbr_idx[..., None, None], axis=2
                        )  # [G, A, k, o, b]
                        ub = jnp.einsum("oi,gjib->gjob", bj, xn)
                        vk = vk + ub[gar, nbr_idx]
                        return jnp.einsum("bmc,gakob,gakm->gakoc", Q, vk, shj)

                    for jidx, J in enumerate(js):
                        Q = jnp.asarray(_cg(din, J, dout))
                        contrib = one_j(W[..., jidx], b[..., jidx], Q, sh[J])
                        term = contrib if term is None else term + contrib
                    term = jnp.where(inc, term, 0.0)
                acc = term if acc is None else acc + term
            outputs[dout] = acc  # pooled: [G,A,o,c]; else [G,A,k,o,c]

        if self.pool and self.self_interaction:
            si = LinearSE3(self.fiber_in, self.fiber_out, name="self_interact")(
                inp
            )
            outputs = {
                d: outputs[d] + si[d] if d in si else outputs[d]
                for d in outputs
            }
        return outputs


class FeedForwardSE3(nn.Module):
    """`se3_transformer_layer.py:380-394`."""

    fiber: Fiber
    mult: int = 4

    @nn.compact
    def __call__(self, x: dict) -> dict:
        hidden = tuple(d * self.mult for d in self.fiber)
        out = LinearSE3(self.fiber, hidden, name="project_in")(x)
        out = NormSE3(hidden, name="nonlin")(out)
        out = LinearSE3(hidden, self.fiber, name="project_out")(out)
        return out


class AttentionSE3(nn.Module):
    """`se3_transformer_layer.py:415-608` (heads, ConvSE3 keys+values)."""

    fiber: Fiber
    dim_head: int = 24
    heads: int = 8
    attend_self: bool = True

    @nn.compact
    def __call__(self, features: dict, nbr_idx, nbr_mask, rel_dist, sh) -> dict:
        h, dh = self.heads, self.dim_head
        hidden = dh * h
        hidden_fiber = (hidden,) * len(self.fiber)
        scale = dh**-0.5

        queries = LinearSE3(self.fiber, hidden_fiber, name="to_q")(features)
        values = ConvSE3(
            self.fiber, hidden_fiber, pool=False, self_interaction=False,
            name="to_v",
        )(features, nbr_idx, nbr_mask, rel_dist, sh)
        keys = ConvSE3(
            self.fiber, hidden_fiber, pool=False, self_interaction=False,
            name="to_k",
        )(features, nbr_idx, nbr_mask, rel_dist, sh)

        if self.attend_self:
            self_k = LinearSE3(self.fiber, hidden_fiber, name="to_self_k")(features)
            self_v = LinearSE3(self.fiber, hidden_fiber, name="to_self_v")(features)
            keys = {
                d: jnp.concatenate([self_k[d][:, :, None], keys[d]], axis=2)
                for d in keys
            }
            values = {
                d: jnp.concatenate([self_v[d][:, :, None], values[d]], axis=2)
                for d in values
            }
            nbr_mask = jnp.pad(
                nbr_mask, ((0, 0), (0, 0), (1, 0)), constant_values=True
            )

        outputs = {}
        for degree in features:
            q = queries[degree]  # [G, A, h*dh, m]
            kk, vv = keys[degree], values[degree]  # [G, A, K, h*dh, m]
            m = q.shape[-1]
            ga = q.shape[:2]
            q = q.reshape(ga + (h, dh, m))
            K = kk.shape[2]
            kk = kk.reshape(ga + (K, h, dh, m))
            vv = vv.reshape(ga + (K, h, dh, m))
            sim = jnp.einsum("gahdm,gakhdm->gahk", q, kk) * scale
            sim = jnp.where(nbr_mask[:, :, None, :], sim, -1e9)
            attn = jax.nn.softmax(sim, axis=-1)
            out = jnp.einsum("gahk,gakhdm->gahdm", attn, vv)
            outputs[degree] = out.reshape(ga + (h * dh, m))

        return LinearSE3(hidden_fiber, self.fiber, name="to_out")(outputs)


class SE3Transformer(nn.Module):
    """Trunk (`se3_transformer_layer.py:1117-1693`), dense layout.

    Model config (`reference equihgnn/models/equihnn_se3_transformer.py:37-45`):
    dim=hidden, heads=2, depth=2, dim_head=32, num_degrees=2, valid_radius=5,
    num_neighbors=16 → fiber_hidden=(h,h), fiber_out=(h,), returns type-0.
    """

    dim: int = 64
    heads: int = 2
    depth: int = 2
    dim_head: int = 32
    num_degrees: int = 2
    valid_radius: float = 1e5
    num_neighbors: int = 16
    attend_self: bool = True
    remat_blocks: bool = True  # recompute block edge tensors in backward

    @nn.compact
    def __call__(
        self,
        feats,  # [N, dim] type-0
        coords,  # [N, 3]
        graph_id,
        slot_index,
        slot_mask,
        atom_slot,
        slot_gid=None,  # [R, A] molecule id per slot (packed rows)
    ):
        fiber_in = (self.dim,)
        fiber_hidden = (self.dim,) * self.num_degrees
        fiber_out = (self.dim,)
        sm = slot_mask
        g_, a_ = sm.shape
        gar = jnp.arange(g_)[:, None, None]

        fd = feats[slot_index] * sm[..., None]
        pd = coords[slot_index] * sm[..., None]

        k = min(self.num_neighbors, a_ - 1)
        nbr_idx, nbr_mask, sqd = knn_dense(
            pd, sm, k,
            valid_radius=self.valid_radius, squared_radius=False,
            exclude_self=True, slot_gid=slot_gid,
        )
        rel_pos = pd[:, :, None, :] - pd[gar, nbr_idx]
        rel_dist = jnp.where(nbr_mask, jnp.sqrt(jnp.maximum(sqd, 0.0)), 0.0)[..., None]
        max_j = 2 * (self.num_degrees - 1)
        sh = spherical_harmonics(max_j, rel_pos)

        # per-block remat: backward recomputes one block's per-edge tensors
        # at a time instead of saving every block's (OOM at batch 768 on a
        # 16 GB chip)
        conv_cls = nn.remat(ConvSE3) if self.remat_blocks else ConvSE3
        attn_cls = nn.remat(AttentionSE3) if self.remat_blocks else AttentionSE3

        x = {0: fd[..., None]}
        x = conv_cls(fiber_in, fiber_hidden, name="conv_in")(
            x, nbr_idx, nbr_mask, rel_dist, sh
        )

        for i in range(self.depth):
            res = x
            out = NormSE3(fiber_hidden, name=f"attn_prenorm_{i}")(x)
            out = attn_cls(
                fiber_hidden,
                dim_head=self.dim_head,
                heads=self.heads,
                attend_self=self.attend_self,
                name=f"attn_{i}",
            )(out, nbr_idx, nbr_mask, rel_dist, sh)
            x = {d: out[d] + res[d] for d in out}
            res = x
            out = NormSE3(fiber_hidden, name=f"ff_prenorm_{i}")(x)
            out = FeedForwardSE3(fiber_hidden, name=f"ff_{i}")(out)
            x = {d: out[d] + res[d] for d in out}

        x = conv_cls(fiber_hidden, fiber_out, name="conv_out")(
            x, nbr_idx, nbr_mask, rel_dist, sh
        )

        type0 = x[0][..., 0]  # [G, A, dim]
        return type0[graph_id, atom_slot]
