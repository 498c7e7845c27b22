"""Kernel parity tests against small pure-numpy oracles re-implementing the
reference CUDA semantics (correlation_kernel.cu, fastba/ba.cpp:neighbors)."""

import jax
import jax.numpy as jnp
import numpy as np

from rampvo_tpu.ops import corr, neighbors, patchify, segment_softmax, segment_sum, compact_ids


# ---------------------------------------------------------------------------
# numpy oracles (direct transliteration of the CUDA kernel semantics)
# ---------------------------------------------------------------------------

def oracle_patchify(net, coords, R, bilinear=True):
    """net [N,H,W,C], coords [N,M,2] -> [N,M,d,d,C]"""
    N, H, W, C = net.shape
    M = coords.shape[1]
    D = 2 * R + 2
    raw = np.zeros((N, M, D, D, C), net.dtype)
    for n in range(N):
        for m in range(M):
            x, y = coords[n, m]
            for a in range(D):
                for b in range(D):
                    i = int(np.floor(y)) + a - R
                    j = int(np.floor(x)) + b - R
                    if 0 <= i < H and 0 <= j < W:
                        raw[n, m, a, b] = net[n, i, j]
    if not bilinear:
        return raw
    d = 2 * R + 1
    out = np.zeros((N, M, d, d, C), net.dtype)
    for n in range(N):
        for m in range(M):
            x, y = coords[n, m]
            dx, dy = x - np.floor(x), y - np.floor(y)
            out[n, m] = (
                (1 - dy) * (1 - dx) * raw[n, m, :d, :d]
                + (1 - dy) * dx * raw[n, m, :d, 1:]
                + dy * (1 - dx) * raw[n, m, 1:, :d]
                + dy * dx * raw[n, m, 1:, 1:]
            )
    return out


def oracle_corr(gmap, fmap, coords, ii, jj, R):
    """gmap [Mg,P,P,C], fmap [Nf,H,W,C], coords [E,P,P,2] -> [E,P,P,d*d]."""
    E, P = coords.shape[0], coords.shape[1]
    Nf, H, W, C = fmap.shape
    D = 2 * R + 2
    vol = np.zeros((E, P, P, D, D), np.float32)
    for e in range(E):
        for p in range(P):
            for q in range(P):
                x, y = coords[e, p, q]
                for a in range(D):  # y window
                    for b in range(D):  # x window
                        i1 = int(np.floor(y)) + a - R
                        j1 = int(np.floor(x)) + b - R
                        if 0 <= i1 < H and 0 <= j1 < W:
                            vol[e, p, q, a, b] = np.dot(
                                gmap[ii[e], p, q], fmap[jj[e], i1, j1]
                            )
    d = 2 * R + 1
    out = np.zeros((E, P, P, d, d), np.float32)
    for e in range(E):
        for p in range(P):
            for q in range(P):
                x, y = coords[e, p, q]
                dx, dy = x - np.floor(x), y - np.floor(y)
                out[e, p, q] = (
                    (1 - dx) * (1 - dy) * vol[e, p, q, :d, :d]
                    + dx * (1 - dy) * vol[e, p, q, :d, 1:]
                    + (1 - dx) * dy * vol[e, p, q, 1:, :d]
                    + dx * dy * vol[e, p, q, 1:, 1:]
                )
    # reference permutes window dims (x-shift index before y-shift index)
    return np.swapaxes(out, -1, -2).reshape(E, P, P, d * d)


def oracle_neighbors(kk, jj):
    E = len(kk)
    ix = np.full(E, -1)
    jx = np.full(E, -1)
    for u in np.unique(kk):
        idx = [e for e in range(E) if kk[e] == u]
        idx.sort(key=lambda e: jj[e])  # python sort is stable
        for a, e in enumerate(idx):
            ix[e] = idx[a - 1] if a > 0 else -1
            jx[e] = idx[a + 1] if a < len(idx) - 1 else -1
    return ix, jx


# ---------------------------------------------------------------------------


def test_patchify_matches_oracle():
    rng = np.random.default_rng(0)
    net = rng.normal(size=(3, 20, 24, 8)).astype(np.float32)
    coords = rng.uniform(1, 18, size=(3, 5, 2)).astype(np.float32)
    for R in [0, 1]:
        got = np.asarray(patchify(jnp.asarray(net), jnp.asarray(coords), R))
        want = oracle_patchify(net, coords, R)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_patchify_out_of_bounds_zero():
    rng = np.random.default_rng(1)
    net = rng.normal(size=(1, 10, 10, 4)).astype(np.float32)
    coords = np.array([[[0.2, 0.3], [9.5, 9.5], [-3.0, -3.0]]], np.float32)
    got = np.asarray(patchify(jnp.asarray(net), jnp.asarray(coords), 1))
    want = oracle_patchify(net, coords, 1)
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert np.all(got[0, 2] == 0)  # fully out of bounds


def test_corr_matches_oracle():
    rng = np.random.default_rng(2)
    Mg, Nf, P, C, H, W, E, R = 6, 3, 3, 16, 30, 40, 10, 3
    gmap = rng.normal(size=(Mg, P, P, C)).astype(np.float32)
    fmap = rng.normal(size=(Nf, H, W, C)).astype(np.float32)
    coords = rng.uniform(-2, 38, size=(E, P, P, 2)).astype(np.float32)
    ii = rng.integers(0, Mg, size=E)
    jj = rng.integers(0, Nf, size=E)
    got = np.asarray(
        corr(jnp.asarray(gmap), jnp.asarray(fmap), jnp.asarray(coords),
             jnp.asarray(ii), jnp.asarray(jj), R)
    )
    want = oracle_corr(gmap, fmap, coords, ii, jj, R)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_corr_gradients_flow():
    rng = np.random.default_rng(3)
    gmap = jnp.asarray(rng.normal(size=(4, 3, 3, 8)).astype(np.float32))
    fmap = jnp.asarray(rng.normal(size=(2, 16, 16, 8)).astype(np.float32))
    coords = jnp.asarray(rng.uniform(3, 12, size=(5, 3, 3, 2)).astype(np.float32))
    ii = jnp.asarray(rng.integers(0, 4, size=5))
    jj = jnp.asarray(rng.integers(0, 2, size=5))

    def loss(g, f):
        return jnp.sum(corr(g, f, coords, ii, jj, 3) ** 2)

    g1, g2 = jax.grad(loss, argnums=(0, 1))(gmap, fmap)
    assert np.isfinite(np.asarray(g1)).all() and np.abs(np.asarray(g1)).sum() > 0
    assert np.isfinite(np.asarray(g2)).all() and np.abs(np.asarray(g2)).sum() > 0


def test_neighbors_matches_oracle():
    rng = np.random.default_rng(4)
    E = 40
    kk = rng.integers(0, 8, size=E)
    jj = rng.integers(0, 12, size=E)
    got_ix, got_jx = neighbors(jnp.asarray(kk), jnp.asarray(jj))
    want_ix, want_jx = oracle_neighbors(kk, jj)
    np.testing.assert_array_equal(np.asarray(got_ix), want_ix)
    np.testing.assert_array_equal(np.asarray(got_jx), want_jx)


def test_neighbors_respects_valid_mask():
    kk = jnp.asarray([0, 0, 0, 1])
    jj = jnp.asarray([1, 2, 3, 1])
    valid = jnp.asarray([True, False, True, True])
    ix, jx = neighbors(kk, jj, valid)
    # edge1 invalid -> edge0's next is edge2
    assert int(jx[0]) == 2 and int(ix[2]) == 0
    assert int(ix[1]) == -1 and int(jx[1]) == -1


def test_segment_softmax_basic():
    x = jnp.asarray([[1.0], [2.0], [3.0], [4.0]])
    ids = jnp.asarray([0, 0, 1, 1])
    w = np.asarray(segment_softmax(x, ids, 2))
    np.testing.assert_allclose(w[0] + w[1], 1.0, atol=1e-6)
    np.testing.assert_allclose(w[2] + w[3], 1.0, atol=1e-6)
    # matches plain softmax within each group
    e = np.exp([1.0, 2.0])
    np.testing.assert_allclose(w[:2, 0], e / e.sum(), rtol=1e-5)


def test_segment_softmax_masked():
    x = jnp.ones((4, 2))
    ids = jnp.asarray([0, 0, 0, 1])
    valid = jnp.asarray([True, True, False, True])
    w = np.asarray(segment_softmax(x, ids, 2, valid))
    np.testing.assert_allclose(w[2], 0.0, atol=1e-7)
    np.testing.assert_allclose(w[0] + w[1], 1.0, atol=1e-6)


def test_compact_ids():
    ids = jnp.asarray([7, 3, 7, 100, 3, 3])
    ranks = np.asarray(compact_ids(ids, 6))
    # 3 -> 0, 7 -> 1, 100 -> 2
    np.testing.assert_array_equal(ranks, [1, 0, 1, 2, 0, 0])


def test_neighbors_presorted_matches_dynamic():
    """Static-schedule neighbours (host-side sort + in-graph masked scans)
    must equal the dynamic lexsort path under any validity mask."""
    from rampvo_tpu.ops.neighbors import (
        neighbors_presorted,
        neighbors_static_order,
    )

    rng = np.random.default_rng(7)
    E = 60
    kk = rng.integers(0, 9, size=E)
    jj = rng.integers(0, 14, size=E)
    # note: (kk, jj) duplicates possible — both paths use stable order
    order, track_start = neighbors_static_order(kk, jj)
    for seed in range(4):
        valid = jnp.asarray(np.random.default_rng(seed).random(E) < 0.7)
        a_ix, a_jx = neighbors(jnp.asarray(kk), jnp.asarray(jj), valid)
        b_ix, b_jx = neighbors_presorted(order, track_start, valid)
        np.testing.assert_array_equal(np.asarray(a_ix), np.asarray(b_ix))
        np.testing.assert_array_equal(np.asarray(a_jx), np.asarray(b_jx))
