"""Ragged numpy oracles for the 2-D baseline attention machinery
(VERDICT r1 #10): _GATBase softmax-with-self-loop (GAT + GATv2) and Set2Set
pooling, akin to tests/test_hgconv.py's torch-semantics oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from equihgnn_tpu.data.batching import pad_graph_batch, spec_for_samples
from equihgnn_tpu.data.synthetic import make_synthetic_dataset
from equihgnn_tpu.models.baseline_2d import Set2Set, _GATBase


def _sigmoid(v):
    return 1.0 / (1.0 + np.exp(-v))


def _lrelu(v, s=0.2):
    return np.where(v > 0, v, s * v)


def _gat_oracle(params, x, src, dst, eattr, v2, heads, f):
    """PyG GAT(v2)Conv semantics on ragged edge lists, float64:
    self-loops with fill_value='mean' edge features, LeakyReLU(0.2),
    softmax over incoming ∪ {self}, head mean, bias."""
    p = {k: np.asarray(v["kernel"] if isinstance(v, dict) and "kernel" in v else v,
                       np.float64) for k, v in params.items()}
    n = x.shape[0]
    if v2:
        # PyG GATv2Conv lin_l/lin_r default bias=True (reference golden
        # model_gatv2_last_mean.npz binds this)
        xs = (x @ p["lin_l"] + np.asarray(params["lin_l"]["bias"], np.float64)
              ).reshape(n, heads, f)
        xd = (x @ p["lin_r"] + np.asarray(params["lin_r"]["bias"], np.float64)
              ).reshape(n, heads, f)
    else:
        xs = (x @ p["lin"]).reshape(n, heads, f)
        xd = xs
    ea = (eattr @ p["lin_edge_kernel"]).reshape(-1, heads, f)
    # self-loop edge feature = mean of incoming real edge features
    eself = np.zeros((n, eattr.shape[1]))
    for i in range(n):
        inc = eattr[dst == i]
        if len(inc):
            eself[i] = inc.mean(0)
    eself = (eself @ p["lin_edge_kernel"]).reshape(n, heads, f)

    if v2:
        att = np.asarray(params["att"], np.float64)[0]
        logit = lambda s_, d_, e_: (_lrelu(xs[s_] + xd[d_] + e_) * att).sum(-1)
        self_logits = np.stack(
            [(_lrelu(xs[i] + xd[i] + eself[i]) * att).sum(-1) for i in range(n)]
        )
        edge_logits = np.stack(
            [logit(s, d, ea[k]) for k, (s, d) in enumerate(zip(src, dst))]
        ) if len(src) else np.zeros((0, heads))
    else:
        a_s = np.asarray(params["att_src"], np.float64)[0]
        a_d = np.asarray(params["att_dst"], np.float64)[0]
        a_e = np.asarray(params["att_edge"], np.float64)[0]
        asrc = (xs * a_s).sum(-1)
        adst = (xd * a_d).sum(-1)
        self_logits = _lrelu(asrc + adst + (eself * a_e).sum(-1))
        edge_logits = (
            _lrelu(asrc[src] + adst[dst] + (ea * a_e).sum(-1))
            if len(src) else np.zeros((0, heads))
        )

    out = np.zeros((n, heads, f))
    for i in range(n):
        sel = np.where(dst == i)[0]
        logits = np.concatenate([edge_logits[sel], self_logits[i : i + 1]])
        ex = np.exp(logits - logits.max(0))
        alpha = ex / ex.sum(0)
        vals = np.concatenate([xs[src[sel]], xs[i : i + 1]])
        out[i] = (alpha[:, :, None] * vals).sum(0)
    return out.mean(1) + np.asarray(params["bias"], np.float64)


def _run_gat(v2, rng):
    n, m, f, heads = 9, 14, 6, 4
    x = rng.standard_normal((n, f)).astype(np.float32)
    src = rng.integers(0, n, size=m)
    dst = rng.integers(0, n, size=m)
    eattr = rng.standard_normal((m, f)).astype(np.float32)

    mod = _GATBase(f, heads=heads, v2=v2)
    # padded inputs: extra padded edges must not change anything
    pad = 6
    xp = np.concatenate([x, np.zeros((3, f), np.float32)])
    srcp = np.concatenate([src, np.full(pad, n + 2)])
    dstp = np.concatenate([dst, np.full(pad, n + 2)])
    ep = np.concatenate([eattr, np.zeros((pad, f), np.float32)])
    emask = np.concatenate([np.ones(m, bool), np.zeros(pad, bool)])
    amask = np.concatenate([np.ones(n, bool), np.zeros(3, bool)])

    variables = mod.init(
        jax.random.PRNGKey(0), jnp.asarray(xp), jnp.asarray(srcp),
        jnp.asarray(dstp), jnp.asarray(ep), jnp.asarray(emask),
        jnp.asarray(amask), True,
    )
    got = mod.apply(
        variables, jnp.asarray(xp), jnp.asarray(srcp), jnp.asarray(dstp),
        jnp.asarray(ep), jnp.asarray(emask), jnp.asarray(amask), True,
    )
    want = _gat_oracle(
        jax.tree.map(np.asarray, variables["params"]),
        x.astype(np.float64), src, dst, eattr.astype(np.float64),
        v2, heads, f,
    )
    np.testing.assert_allclose(np.asarray(got)[:n], want, rtol=2e-5, atol=2e-5)


def test_gat_softmax_with_self_loop_oracle(rng):
    _run_gat(False, rng)


def test_gatv2_softmax_with_self_loop_oracle(rng):
    _run_gat(True, rng)


def _lstm_step(p, carry, inp):
    c, h = carry
    dense = lambda name, v: v @ np.asarray(p[name]["kernel"], np.float64) + (
        np.asarray(p[name]["bias"], np.float64) if "bias" in p[name] else 0.0
    )
    i = _sigmoid(dense("ii", inp) + dense("hi", h))
    f = _sigmoid(dense("if", inp) + dense("hf", h))
    g = np.tanh(dense("ig", inp) + dense("hg", h))
    o = _sigmoid(dense("io", inp) + dense("ho", h))
    c = f * c + i * g
    h = o * np.tanh(c)
    return (c, h)


def test_set2set_oracle(rng):
    """Full numpy Set2Set (LSTM + per-graph attention softmax) vs the padded
    segment-op implementation."""
    d, n_graphs = 5, 3
    sizes = [4, 2, 5]
    xs = [rng.standard_normal((s, d)).astype(np.float32) for s in sizes]
    x = np.concatenate(xs)
    gid = np.concatenate([np.full(s, i) for i, s in enumerate(sizes)])

    # padded layout with 2 padded atoms pointing at a padding graph
    G = n_graphs + 1
    xp = np.concatenate([x, np.zeros((2, d), np.float32)])
    gidp = np.concatenate([gid, np.full(2, n_graphs)])
    mask = np.concatenate([np.ones(len(x), bool), np.zeros(2, bool)])

    mod = Set2Set(d, processing_steps=2)
    variables = mod.init(
        jax.random.PRNGKey(1), jnp.asarray(xp), jnp.asarray(gidp), G,
        mask=jnp.asarray(mask),
    )
    got = np.asarray(
        mod.apply(variables, jnp.asarray(xp), jnp.asarray(gidp), G,
                  mask=jnp.asarray(mask))
    )

    lstm = jax.tree.map(np.asarray, variables["params"]["lstm"])
    x64 = x.astype(np.float64)
    carry = (np.zeros((G, d)), np.zeros((G, d)))
    q_star = np.zeros((G, 2 * d))
    for _ in range(2):
        carry = _lstm_step(lstm, carry, q_star)
        q = carry[1]
        r = np.zeros((G, d))
        for g in range(n_graphs):
            sel = gid == g
            e = (x64[sel] * q[g]).sum(-1)
            a = np.exp(e - e.max())
            a /= a.sum()
            r[g] = (a[:, None] * x64[sel]).sum(0)
        q_star = np.concatenate([q, r], axis=-1)
    np.testing.assert_allclose(got[:n_graphs], q_star[:n_graphs], rtol=2e-5, atol=2e-5)


def test_pooling_variants_padding_invariant(rng):
    """attention / set2set pooling on a padded 2-graph batch equals the same
    graphs pooled alone (segment ops must not leak across graphs/padding)."""
    import dataclasses

    from equihgnn_tpu import create_model
    from equihgnn_tpu.models.config import ModelConfig

    samples = make_synthetic_dataset(6, seed=2, hyper=False, num_targets=1)
    for pooling in ("attention", "set2set"):
        cfg = ModelConfig(gnn_num_layer=2, gnn_emb_dim=12,
                          gnn_graph_pooling=pooling)
        model = create_model("gin", num_target=1, cfg=cfg, gnn_type="gin")
        spec = spec_for_samples(samples, batch_size=6)
        full = pad_graph_batch(samples, spec, target=0)
        v = model.init(jax.random.PRNGKey(0), jax.tree.map(jnp.asarray, full),
                       deterministic=True)
        out_full = np.asarray(
            model.apply(v, jax.tree.map(jnp.asarray, full), deterministic=True)
        )
        for i in (0, 3, 5):
            solo = pad_graph_batch([samples[i]], spec, target=0)
            out_solo = np.asarray(
                model.apply(v, jax.tree.map(jnp.asarray, solo),
                            deterministic=True)
            )
            np.testing.assert_allclose(out_full[i], out_solo[0],
                                       rtol=2e-4, atol=2e-4)


def test_gat_dense_matches_flat():
    """The dense per-molecule GAT aggregation must equal the flat segment
    path exactly (same batch, tables stripped)."""
    import dataclasses as _dc

    import jax
    import jax.numpy as jnp

    from equihgnn_tpu import create_model
    from equihgnn_tpu.data.batching import BatchSpec, pad_graph_batch
    from equihgnn_tpu.data.synthetic import make_synthetic_dataset
    from equihgnn_tpu.models.config import ModelConfig

    samples = make_synthetic_dataset(6, seed=11, hyper=False)
    spec = BatchSpec(num_graphs=8, num_atoms=256, num_hedges=512, nnz=512,
                     max_atoms_per_graph=32, num_hedge_slots=80)
    b_dense = jax.tree.map(jnp.asarray, pad_graph_batch(samples, spec, target=0))
    assert b_dense.eslot_src is not None
    b_flat = _dc.replace(
        b_dense, slot_index=None, slot_mask=None, atom_slot=None,
        eslot_src=None, eslot_dst=None, eslot_edge=None, eslot_mask=None,
    )
    for gnn_type in ("gat", "gatv2"):
        cfg = ModelConfig(gnn_num_layer=2, gnn_emb_dim=32)
        model = create_model(gnn_type, num_target=1, cfg=cfg, gnn_type=gnn_type)
        variables = model.init(jax.random.PRNGKey(0), b_dense, deterministic=True)
        o1 = model.apply(variables, b_dense, deterministic=True)
        o2 = model.apply(variables, b_flat, deterministic=True)
        np.testing.assert_allclose(
            np.asarray(o1)[:6], np.asarray(o2)[:6], rtol=2e-5, atol=2e-6
        )
