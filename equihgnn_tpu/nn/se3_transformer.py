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

Round-3 MXU/remat restructure (measured in `scripts/se3_probe.py`):
  * the per-J Python loop of the unpooled (attention key/value) path ran its
    node-side einsums at 58 TF/s; batching all J into one einsum with the
    small input-m axis as the host loop runs at ~148 TF/s;
  * attention keys and values (two independently-parameterized ConvSE3 in the
    reference, `:448-474`) are evaluated by one `stack=2` conv sharing the
    neighbor one-hot and CG·SH tensors;
  * remat is single-level and surgical: each (degree_in, degree_out) pair is
    an `nn.remat` submodule (its radial hidden — ~0.4 GB/pair at batch 768 —
    is recomputed, not saved), with an inner `jax.checkpoint` around each
    (stack, input-m) step so the ~2.4 GB node-side `u` temps never coexist.
    The previous design double-rematted (outer block remat × inner
    checkpoints), recomputing every conv ~2 extra times.
"""

from __future__ import annotations

from functools import lru_cache
from math import sqrt

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from equihgnn_tpu.nn.mlp import TorchLinear
from equihgnn_tpu.ops import flop_tally
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
            out[degree] = jnp.einsum(
                "...dm,de->...em", x[degree], w.astype(x[degree].dtype)
            )
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
                safe_norm(t.astype(jnp.float32), axis=-1, keepdims=True),
                self.eps,
            )
            phase = t / norm.astype(t.dtype)
            scale = self.param(f"scale{degree}", nn.initializers.ones, (chan,))
            transformed = norm[..., 0] * scale
            if self.use_gelu:
                transformed = nn.gelu(transformed)
            out[degree] = transformed.astype(t.dtype)[..., None] * phase
        return out


class StackedRadialTrunk(nn.Module):
    """``n`` independently-parameterized radial hiddens
    (`se3_transformer_layer.py:311-336` minus the final projection, which the
    conv applies in factorized form — see below) evaluated as ONE batched op.

    A ConvSE3 has one radial function per (degree_in, degree_out, stack) unit,
    all reading the same [G, A, k, 1] distances. Running them as separate
    Linear/LayerNorm/GELU chains inside each rematted pair put ~184 tiny
    [G, A, k]-shaped fusions on the step's critical path (device trace,
    PERF.md); batching the unit axis into the einsums turns that into 4 ops
    per ConvSE3, outside the remat so backward does not replay them."""

    n: int
    mid_dim: int = 128

    @nn.compact
    def __call__(self, rel_dist):  # [G, A, k, 1] -> [n, G, A, k, f]
        f = self.mid_dim

        def u(bound):
            return lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound)

        # lin0 is 1 -> f, so the matmul degenerates to scale-and-shift
        w0 = self.param("lin0_w", u(1.0), (self.n, f))
        b0 = self.param("lin0_b", u(1.0), (self.n, f))
        w1 = self.param("lin1_w", u(1.0 / sqrt(f)), (self.n, f, f))
        b1 = self.param("lin1_b", u(1.0 / sqrt(f)), (self.n, f))
        dt = rel_dist.dtype
        # (A, k) merged: LN stats come out [n, G, A·k] instead of
        # [n, G, A, k] — a minor dim of 16 tiles to 128 lanes (8× padded
        # HBM traffic, ~28 ms/step on a device trace at bench shapes)
        g_, a_, k_ = rel_dist.shape[:3]
        rd = rel_dist.reshape(g_, a_ * k_, 1)
        h = rd * w0[:, None, None, :].astype(dt) + b0[:, None, None, :].astype(dt)
        h = nn.gelu(self._ln(h, "ln0"))
        h = jnp.einsum("ngqf,nfe->ngqe", h, w1.astype(dt)) + b1[
            :, None, None, :
        ].astype(dt)
        h = nn.gelu(self._ln(h, "ln1"))
        return h.reshape(self.n, g_, a_, k_, f)

    def _ln(self, h, name):
        scale = self.param(f"{name}_scale", nn.initializers.ones, (self.n, self.mid_dim))
        bias = self.param(f"{name}_bias", nn.initializers.zeros, (self.n, self.mid_dim))
        h32 = h.astype(jnp.float32)
        mu = jnp.mean(h32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(h32 - mu), axis=-1, keepdims=True)
        out = (h32 - mu) * jax.lax.rsqrt(var + 1e-5)
        brod = (slice(None),) + (None,) * (h.ndim - 2) + (slice(None),)
        return (out * scale[brod] + bias[brod]).astype(h.dtype)


def _radial_proj_params(mdl, name, f, nc_out, nc_in, num_freq):
    """Final RadialFunc projection W [f, o, i, J], b [o, i, J] (torch Linear
    init, fan_in = f) — never materialized as a per-edge matrix."""
    bound = 1.0 / sqrt(f)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    W = mdl.param(f"{name}_W", init, (f, nc_out, nc_in, num_freq))
    b = mdl.param(f"{name}_b", init, (nc_out, nc_in, num_freq))
    return W, b


class _ConvSE3Pair(nn.Module):
    """One (degree_in → degree_out) TFN unit; rematted by ConvSE3 so the
    edge-side temps are recomputed in backward. The radial hidden ``h``
    [S, G, A, k, f], neighbor one-hot and CG-weighted SH ``w_sh``
    [G, A, k, J, b, c] arrive precomputed from the trunk/conv level (shared
    across pairs and never replayed by this module's remat)."""

    din: int
    dout: int
    nc_in: int
    nc_out: int
    pool: bool
    stack: int = 1
    radial_mid_dim: int = 128

    @nn.compact
    def __call__(self, xn, onehot, nbr_mask, w_sh, h):
        din, dout, s, f = self.din, self.dout, self.stack, self.radial_mid_dim
        inc = nbr_mask[..., None, None]
        js = list(range(abs(din - dout), din + dout + 1))
        b_in = 2 * din + 1
        c_out = 2 * dout + 1
        sfx = [("_%d" % si) if s > 1 else "" for si in range(s)]

        Wb = [
            _radial_proj_params(
                self, f"radial{sfx[si]}_out", f, self.nc_out, self.nc_in,
                len(js),
            )
            for si in range(s)
        ]
        dt = xn.dtype
        W = jnp.stack([w for w, _ in Wb]).astype(dt)  # [S, f, o, i, J]
        bias = jnp.stack([bb for _, bb in Wb]).astype(dt)  # [S, o, i, J]

        if self.pool:
            # Exact: mean_k[(W·h_k + b)·t_k] = (W·Σ_k h_k⊗t_k + b·Σ_k t_k)/cnt
            # with t the CG×SH-contracted neighbor feature. Inner checkpoint
            # per J: the [S,G,A,f,i] M temp (~3 GB at fiber 256) lives alone.
            from equihgnn_tpu.ops.pallas.pooled_conv import (
                pooled_conv,
                pooled_conv_supported,
            )
            from equihgnn_tpu.ops.pallas.pooled_m import (
                pooled_m,
                pooled_m_supported,
            )

            # formulation FLOPs (one-hot gather as matmul): tallied for the
            # MFU split in bench.py
            xg = flop_tally.tally_einsum("gakj,gjeb->gakeb", onehot, xn)
            g_, a_, k_ = onehot.shape[:3]

            if s == 1 and pooled_conv_supported(
                a_, k_, c_out, self.nc_in, f, self.nc_out, xn.dtype
            ):
                # Fully-fused unit (ops/pallas/pooled_conv.py): M-build +
                # projection in VMEM, no per-J checkpoint needed — the
                # kernel's VJP recomputes M in VMEM, so neither M nor dM
                # ever exists in HBM (the former ~18 GB/pair-J byte block,
                # ROOFLINE.json).
                cnt = jnp.maximum(
                    jnp.sum(nbr_mask.astype(jnp.float32), axis=2), 1.0
                )[..., None, None]
                acc = 0.0
                for jidx in range(len(js)):
                    wshj = w_sh[..., jidx, :, :]
                    tcj = jnp.einsum("gakbc,gakib->gakci", wshj, xg)
                    tsum = jnp.sum(tcj, axis=2)  # [G, A, c, i]
                    acc = acc + pooled_conv(
                        h[0],
                        tcj.reshape(g_, a_, k_, c_out * self.nc_in),
                        W[0, ..., jidx],
                        c_out,
                    )
                    acc = acc + jnp.einsum(
                        "oi,gaci->gaco", bias[0, ..., jidx], tsum
                    )
                out = jnp.swapaxes(acc, -1, -2)[None]  # [1, G, A, o, c]
                return out / cnt[None].astype(out.dtype)

            @jax.checkpoint
            def one_j(Wj, bj, wshj, h, xg):
                # c (≤ 2·dout+1) is batched into the einsums rather than host-
                # looped: the per-c [G,A,i,f] M temps forced XLA to emit a
                # 3 ms {i,f}-transpose copy per c per direction (device trace,
                # ~42 ms/step total); one [G,A,f,c·i] matmul keeps the layout
                # the consumer dot wants.
                tc = jnp.einsum("gakbc,gakib->gakci", wshj, xg)
                tsum = jnp.sum(tc, axis=2)  # [G, A, c, i]
                c_, i_ = tc.shape[-2:]
                # sub-f32 only: at f32 (or wider) the kernel's explicit
                # [G,A,c·i,f] M output (~6 GB at fiber 256) tipped the step
                # 170 MB past the 15.75 GB v5e HBM at compile time
                # (bench --all OOM, round 3); the XLA einsum path fits and
                # f32 saw no win from the kernel anyway (the 2.9 TF/s
                # lowering it fixes is the bf16 one).
                use_kernel = (
                    s == 1
                    and jnp.dtype(h.dtype).itemsize < 4
                    and pooled_m_supported(k_, c_ * i_, f)
                )
                if use_kernel:
                    # K=16 contraction in VMEM (ops/pallas/pooled_m.py):
                    # XLA's batched-small-matmul lowering of the M einsum ran
                    # at ~2.9 TF/s; the kernel emits M in the projection's
                    # (i, f)-minor layout directly.
                    m2 = pooled_m(h[0], tc.reshape(g_, a_, k_, c_ * i_))
                    m2 = m2.reshape(g_, a_, c_, i_, f).astype(h.dtype)
                    return (
                        jnp.einsum("foi,gacif->gaoc", Wj[0], m2)[None]
                        + jnp.einsum("soi,gaci->sgaoc", bj, tsum)
                    )
                M = jnp.einsum("sgakf,gakci->sgafci", h, tc)
                return (
                    jnp.einsum("sfoi,sgafci->sgaoc", Wj, M)
                    + jnp.einsum("soi,gaci->sgaoc", bj, tsum)
                )

            res = 0.0
            for jidx in range(len(js)):
                res = res + one_j(
                    W[..., jidx], bias[..., jidx], w_sh[..., jidx, :, :], h, xg
                )
            cnt = jnp.maximum(
                jnp.sum(nbr_mask.astype(jnp.float32), axis=2), 1.0
            )[..., None, None]
            return res / cnt[None].astype(res.dtype)  # [S, G, A, o, c]

        # Unpooled (per-edge outputs for attention keys/values):
        #   v_e = (W·h_e + b)·x_{j(e)}, then CG×SH per output column.
        # Node-side u = W·x (16× fewer sites than edges), mixed with h via a
        # dense one-hot neighbor matmul. The (J, o) output axes are merged
        # into one p axis so u and v are plain rank-5 batched matmuls — the
        # earlier separate-J/o form made XLA materialize a layout copy of
        # every u ([G,A,J,f,o], 4.4 ms each, 52 ms/step on a device trace).
        # Host loop over input-m with an inner checkpoint per step so only
        # one u temp is ever live.
        hd = flop_tally.tally_einsum("gikj,sgikf->sgijf", onehot, h)
        # [S, f, o, i, J] -> [S, f, J·o, i] (J outer, o inner)
        Wp = jnp.moveaxis(W, -1, 2).reshape(s, f, len(js) * self.nc_out, self.nc_in)
        bp = jnp.moveaxis(bias, -1, 1).reshape(s, len(js) * self.nc_out, self.nc_in)

        def one_b(Wp, bp, hds, xnb, wshb, onehot):
            # Wp [S,f,p,i]; hds [S,G,A,A,f]; xnb [G,A,i]; wshb [G,A,k,J,c]
            u = jnp.einsum("sfpi,gji->sgjpf", Wp, xnb)
            v = jnp.einsum("sgajf,sgjpf->sgjap", hds, u)
            vk = flop_tally.tally_einsum("gakj,sgjap->sgakp", onehot, v)
            ub = jnp.einsum("spi,gji->sgjp", bp, xnb)
            ubk = flop_tally.tally_einsum("gakj,sgjp->sgakp", onehot, ub)
            ek = (vk + ubk).reshape(vk.shape[:4] + (len(js), self.nc_out))
            return jnp.einsum("sgakJo,gakJc->sgakoc", ek, wshb)

        # Batch the stack axis into the einsums when the u temp stays small;
        # in fp32 the (1,1) pair (p = 3·o) keeps the per-stack loop to halve
        # the backward working set (16 GB HBM on v5e) — in bf16 the batched
        # u temp is ~1.5 GB transient inside the checkpoint and fits.
        # Inner checkpoint policy: the (0,0)/(0,1) pairs' u temps are one
        # ~0.5 GB tensor (b_in=1) — cheaper to save than to replay; the
        # multi-b_in / J=3 pairs checkpoint each (stack, input-m) step so
        # only one u temp is ever live.
        if s * len(js) <= 2 and b_in == 1:
            res_s = one_b(Wp, bp, hd, xn[..., 0], w_sh[..., 0, :], onehot)
        elif s * len(js) <= 2:
            ckpt_b = jax.checkpoint(one_b)
            res_s = 0.0
            for bi in range(b_in):
                res_s = res_s + ckpt_b(
                    Wp, bp, hd, xn[..., bi], w_sh[..., bi, :], onehot
                )
        else:
            ckpt_b = jax.checkpoint(one_b)
            parts = []
            for si in range(s):
                acc = 0.0
                for bi in range(b_in):
                    acc = acc + ckpt_b(
                        Wp[si : si + 1], bp[si : si + 1], hd[si : si + 1],
                        xn[..., bi], w_sh[..., bi, :], onehot,
                    )
                parts.append(acc)
            res_s = jnp.concatenate(parts, axis=0)
        return jnp.where(inc[None], res_s, 0.0)  # [S, G, A, k, o, c]


class ConvSE3(nn.Module):
    """TFN convolution (`se3_transformer_layer.py:187-308`), direct CG×SH.

    TPU memory/FLOP redesign (exact, mirrors `equihgnn_tpu/nn/equiformer.py`):
    the reference materializes the per-edge kernel matrix R(dist) [o, i, J]
    — tens of GB and petaFLOPs at fiber 256 / batch 768. Instead, with
    R_J = W_J·h + b_J (h = radial hidden, f=128):

      * pool=True: the neighbor mean commutes with W_J — contract h against
        neighbors first, then apply W_J once per node;
      * pool=False: apply W_J at the node sites, mix with the per-edge radial
        hidden through a dense one-hot neighbor matmul, then CG×SH.

    `stack=s` evaluates s independently-parameterized convolutions (e.g.
    attention keys AND values) inside the same einsums and returns a list.
    Each (din, dout) pair is an `nn.remat` submodule — see module docstring.
    """

    fiber_in: Fiber
    fiber_out: Fiber
    self_interaction: bool = True
    pool: bool = True
    radial_mid_dim: int = 128
    stack: int = 1

    @nn.compact
    def __call__(
        self,
        inp: dict,  # {degree: [G, A, dim, 2d+1]}
        onehot,  # [G, A, k, A] masked neighbor one-hot (trunk-level)
        nbr_mask,
        rel_dist,  # [G, A, k, 1]
        wsh_map,  # {(din, dout): [G, A, k, J, b, c]} CG-weighted SH
    ):
        s = self.stack
        pair_cls = _ConvSE3Pair
        pairs = [
            (din, dout)
            for dout in range(len(self.fiber_out))
            for din in range(len(self.fiber_in))
        ]
        # all radial functions of this conv in one batched trunk, OUTSIDE the
        # per-pair remat (see StackedRadialTrunk)
        h_all = StackedRadialTrunk(
            n=len(pairs) * s, mid_dim=self.radial_mid_dim, name="radial_trunks"
        )(rel_dist)
        h_all = jnp.where(nbr_mask[None, ..., None], h_all, 0.0)
        h_all = h_all.reshape((len(pairs), s) + h_all.shape[1:])

        outputs = [{} for _ in range(s)]
        for dout, nc_out in enumerate(self.fiber_out):
            acc = None
            for din, nc_in in enumerate(self.fiber_in):
                term = pair_cls(
                    din=din, dout=dout, nc_in=nc_in, nc_out=nc_out,
                    pool=self.pool, stack=s,
                    radial_mid_dim=self.radial_mid_dim,
                    name=f"pair_{din}_{dout}",
                )(
                    inp[din], onehot, nbr_mask, wsh_map[(din, dout)],
                    h_all[pairs.index((din, dout))],
                )
                acc = term if acc is None else acc + term
            for si in range(s):
                outputs[si][dout] = acc[si]

        if self.pool and self.self_interaction:
            for si in range(s):
                siw = LinearSE3(
                    self.fiber_in, self.fiber_out,
                    name=f"self_interact{('_%d' % si) if s > 1 else ''}",
                )(inp)
                outputs[si] = {
                    d: outputs[si][d] + siw[d] if d in siw else outputs[si][d]
                    for d in outputs[si]
                }
        return outputs[0] if s == 1 else outputs


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
    """`se3_transformer_layer.py:415-608` (heads, ConvSE3 keys+values).

    Keys and values keep their separate parameters (the reference builds two
    ConvSE3) but are computed by one stack=2 conv sharing the neighbor
    one-hot and CG·SH tensors."""

    fiber: Fiber
    dim_head: int = 24
    heads: int = 8
    attend_self: bool = True

    @nn.compact
    def __call__(
        self, features: dict, onehot, nbr_mask, rel_dist, wsh_map
    ) -> dict:
        h, dh = self.heads, self.dim_head
        hidden = dh * h
        hidden_fiber = (hidden,) * len(self.fiber)
        scale = dh**-0.5

        queries = LinearSE3(self.fiber, hidden_fiber, name="to_q")(features)
        keys, values = ConvSE3(
            self.fiber, hidden_fiber, pool=False, self_interaction=False,
            stack=2, name="to_kv",
        )(features, onehot, nbr_mask, rel_dist, wsh_map)

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
            sim = jnp.where(
                nbr_mask[:, :, None, :], sim.astype(jnp.float32), -1e9
            )
            attn = jax.nn.softmax(sim, axis=-1).astype(vv.dtype)
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
    dtype: str | None = None  # e.g. "bfloat16": compute dtype (params f32)

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
        if self.dtype is not None:
            dt = jnp.dtype(self.dtype)
            fd = fd.astype(dt)
            rel_dist = rel_dist.astype(dt)
            sh = [t.astype(dt) for t in sh]

        # Trunk-level shared edge tensors, computed ONCE (not replayed by the
        # per-pair remats):
        #   * masked neighbor one-hot [G, A, k, A] — every neighbor gather is
        #     a one-hot MXU matmul, NEVER an indexed gather — the backward of
        #     a gather is an XLA scatter-add, which a device trace showed
        #     costing 102 ms per occurrence vs <1 ms for the transposed
        #     matmul the one-hot form gets for free;
        #   * CG-weighted SH per (din, dout) pair type:
        #     w_sh[..., J, b, c] = Σ_m CG^{(din,J,dout)}[b,m,c] · Y_J[m].
        cdt = fd.dtype
        onehot = (
            (nbr_idx[..., None] == jnp.arange(a_)[None, None, None, :])
            & nbr_mask[..., None]
        ).astype(cdt)
        nd = self.num_degrees
        wsh_map = {}
        for din in range(nd):
            for dout in range(nd):
                js = list(range(abs(din - dout), din + dout + 1))
                wsh_map[(din, dout)] = jnp.stack(
                    [
                        jnp.einsum(
                            "bmc,gakm->gakbc",
                            jnp.asarray(_cg(din, J, dout), dtype=cdt),
                            sh[J],
                        )
                        for J in js
                    ],
                    axis=3,
                )  # [G, A, k, J, b, c]

        x = {0: fd[..., None]}
        x = ConvSE3(fiber_in, fiber_hidden, name="conv_in")(
            x, onehot, nbr_mask, rel_dist, wsh_map
        )

        for i in range(self.depth):
            res = x
            out = NormSE3(fiber_hidden, name=f"attn_prenorm_{i}")(x)
            out = AttentionSE3(
                fiber_hidden,
                dim_head=self.dim_head,
                heads=self.heads,
                attend_self=self.attend_self,
                name=f"attn_{i}",
            )(out, onehot, nbr_mask, rel_dist, wsh_map)
            x = {d: out[d] + res[d] for d in out}
            res = x
            out = NormSE3(fiber_hidden, name=f"ff_prenorm_{i}")(x)
            out = FeedForwardSE3(fiber_hidden, name=f"ff_{i}")(out)
            x = {d: out[d] + res[d] for d in out}

        x = ConvSE3(fiber_hidden, fiber_out, name="conv_out")(
            x, onehot, nbr_mask, rel_dist, wsh_map
        )

        type0 = x[0][..., 0].astype(jnp.float32)  # [G, A, dim]
        return type0[graph_id, atom_slot]
