"""MHNNConv / MHNNSConv numerical parity vs a ragged numpy oracle.

The oracle reimplements the reference torch semantics
(`reference equihgnn/models/layers/conv.py:87-101,169-182`) directly from the
flax parameters on UNPADDED ragged arrays; the JAX layer runs on a padded
batch. Results must agree exactly on the real rows.
"""

import jax
import jax.numpy as jnp
import numpy as np

from equihgnn_tpu.nn.hgconv import MHNNConv, MHNNSConv
import pytest

pytestmark = pytest.mark.quick


def _np_mlp(params, x, num_layers):
    """normalization='None' MLP oracle: [lin relu]*(L-1) lin."""
    for i in range(num_layers - 1):
        p = params[f"lin_{i}"]
        x = np.maximum(x @ np.asarray(p["kernel"]) + np.asarray(p["bias"]), 0.0)
    p = params[f"lin_{num_layers - 1}"]
    return x @ np.asarray(p["kernel"]) + np.asarray(p["bias"])


def _np_scatter(data, ids, n, reduce):
    out = np.zeros((n, data.shape[1]))
    np.add.at(out, ids, data)
    if reduce == "mean":
        cnt = np.bincount(ids, minlength=n).astype(np.float64)
        out = out / np.maximum(cnt, 1.0)[:, None]
    return out


def _ragged_problem(rng, n=13, ne=7, nnz=25, d=8):
    x = rng.standard_normal((n, d)).astype(np.float32)
    e = rng.standard_normal((ne, d)).astype(np.float32)
    v_idx = rng.integers(0, n, size=nnz)
    e_idx = rng.integers(0, ne, size=nnz)
    return x, e, v_idx, e_idx


def _pad(arr, total, fill=0.0):
    pad = [(0, total - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad, constant_values=fill)


def test_mhnnconv_matches_oracle(rng):
    n, ne, nnz, d = 13, 7, 25, 8
    x, e, v_idx, e_idx = _ragged_problem(rng, n, ne, nnz, d)
    for aggr in ["mean", "sum"]:
        conv = MHNNConv(hid_dim=d, mlp1_layers=2, mlp2_layers=1, mlp3_layers=2,
                        mlp4_layers=1, aggr=aggr, normalization="None")
        # padded inputs
        N, E, Z = n + 5, ne + 3, nnz + 9
        xp, ep = _pad(x, N), _pad(e, E)
        vp = _pad(v_idx, Z, fill=N - 1).astype(np.int32)
        hp = _pad(e_idx, Z, fill=E - 1).astype(np.int32)
        mask = np.arange(Z) < nnz
        amask, emask = np.arange(N) < n, np.arange(E) < ne
        params = conv.init(jax.random.PRNGKey(0), jnp.asarray(xp), jnp.asarray(ep),
                           jnp.asarray(vp), jnp.asarray(hp), jnp.asarray(mask),
                           atom_mask=jnp.asarray(amask), hedge_mask=jnp.asarray(emask))
        xo, eo = conv.apply(params, jnp.asarray(xp), jnp.asarray(ep), jnp.asarray(vp),
                            jnp.asarray(hp), jnp.asarray(mask),
                            atom_mask=jnp.asarray(amask), hedge_mask=jnp.asarray(emask))

        p = jax.tree.map(np.asarray, params["params"])
        mve = _np_mlp(p["W1"], np.concatenate([x[v_idx], e[e_idx]], -1), 2)
        me = _np_scatter(mve, e_idx, ne, aggr)
        e2 = _np_mlp(p["W2"], np.concatenate([e, me], -1), 1)
        mev = _np_mlp(p["W3"], np.concatenate([x[v_idx], e2[e_idx]], -1), 2)
        mv = _np_scatter(mev, v_idx, n, aggr)
        x2 = _np_mlp(p["W4"], np.concatenate([x, mv], -1), 1)

        np.testing.assert_allclose(np.asarray(xo)[:n], x2, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(eo)[:ne], e2, rtol=1e-4, atol=1e-5)


def test_mhnnsconv_matches_oracle(rng):
    n, ne, nnz, d = 11, 6, 21, 8
    x, e, v_idx, e_idx = _ragged_problem(rng, n, ne, nnz, d)
    x0 = rng.standard_normal((n, d)).astype(np.float32)
    conv = MHNNSConv(hid_dim=d, mlp1_layers=2, mlp2_layers=2, mlp3_layers=1,
                     aggr="mean", normalization="None")
    N, E, Z = n + 4, ne + 2, nnz + 6
    xp, x0p = _pad(x, N), _pad(x0, N)
    vp = _pad(v_idx, Z, fill=N - 1).astype(np.int32)
    hp = _pad(e_idx, Z, fill=E - 1).astype(np.int32)
    mask = np.arange(Z) < nnz
    amask = np.arange(N) < n
    args = (jnp.asarray(xp), jnp.asarray(vp), jnp.asarray(hp), jnp.asarray(mask),
            jnp.asarray(x0p), E)
    params = conv.init(jax.random.PRNGKey(1), *args, atom_mask=jnp.asarray(amask))
    out = conv.apply(params, *args, atom_mask=jnp.asarray(amask))

    p = jax.tree.map(np.asarray, params["params"])
    xw = _np_mlp(p["W1"], x, 2)
    xe = _np_scatter(xw[v_idx], e_idx, ne, "mean")
    xev = _np_mlp(p["W2"], np.concatenate([x[v_idx], xe[e_idx]], -1), 2)
    xv = _np_scatter(xev, v_idx, n, "mean")
    want = _np_mlp(p["W3"], 0.5 * xv + 0.5 * x0, 1)
    np.testing.assert_allclose(np.asarray(out)[:n], want, rtol=1e-4, atol=1e-5)


def test_identity_fallback_slices_second_half(rng):
    """mlp*_layers=0 ⇒ W(X) = X[..., d:] (`reference conv.py:33-73`)."""
    n, ne, nnz, d = 9, 5, 14, 4
    x, e, v_idx, e_idx = _ragged_problem(rng, n, ne, nnz, d)
    conv = MHNNConv(hid_dim=d, mlp1_layers=0, mlp2_layers=0, mlp3_layers=0,
                    mlp4_layers=0, aggr="sum", normalization="None")
    mask = np.ones(nnz, dtype=bool)
    params = conv.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(e),
                       jnp.asarray(v_idx.astype(np.int32)),
                       jnp.asarray(e_idx.astype(np.int32)), jnp.asarray(mask))
    xo, eo = conv.apply(params, jnp.asarray(x), jnp.asarray(e),
                        jnp.asarray(v_idx.astype(np.int32)),
                        jnp.asarray(e_idx.astype(np.int32)), jnp.asarray(mask))
    me = _np_scatter(e[e_idx], e_idx, ne, "sum")
    mv = _np_scatter(me[e_idx], v_idx, n, "sum")
    np.testing.assert_allclose(np.asarray(eo), me, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(xo), mv, rtol=1e-5, atol=1e-6)
