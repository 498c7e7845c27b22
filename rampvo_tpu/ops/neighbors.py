"""Temporal-neighbour indices for patch tracks.

Replaces the CPU round-trip in the reference (fastba/ba.cpp:59-97, called
from net.py:77): for every edge e, find the edge sharing the same patch kk
whose target frame jj immediately precedes / follows jj[e]. Implemented as a
single stable argsort on (kk, jj) — fully on-device, jit-safe, static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def neighbors(kk: jnp.ndarray, jj: jnp.ndarray, valid: jnp.ndarray | None = None):
    """Returns (ix, jx): for each edge, index of the previous/next edge in the
    same patch track ordered by jj; -1 where none exists (or edge invalid).

    Ties in jj preserve original order (stable sort), matching the
    reference's std::stable_sort semantics.
    """
    E = kk.shape[0]
    kk = kk.astype(jnp.int32)
    jj = jj.astype(jnp.int32)

    if valid is None:
        valid = jnp.ones(E, dtype=bool)

    # lexicographic stable sort by (invalid, kk, jj); invalid edges sort last
    order = jnp.lexsort((jj, kk, (~valid).astype(jnp.int32)))

    kk_s = kk[order]
    valid_s = valid[order]

    idx = jnp.arange(E)
    prev_same = jnp.concatenate(
        [jnp.zeros(1, dtype=bool), (kk_s[1:] == kk_s[:-1]) & valid_s[1:] & valid_s[:-1]]
    )
    next_same = jnp.concatenate([prev_same[1:], jnp.zeros(1, dtype=bool)])

    prev_idx = jnp.where(prev_same, order[jnp.maximum(idx - 1, 0)], -1)
    next_idx = jnp.where(next_same, order[jnp.minimum(idx + 1, E - 1)], -1)

    ix = jnp.full(E, -1, dtype=jnp.int32).at[order].set(prev_idx.astype(jnp.int32))
    jx = jnp.full(E, -1, dtype=jnp.int32).at[order].set(next_idx.astype(jnp.int32))
    return ix, jx


def neighbors_static_order(kk, jj):
    """Host-side precomputation for `neighbors_presorted`: the sorted order
    and track boundaries of a STATIC edge schedule (numpy in, numpy out).
    The training forward's edge lists are compile-time constants
    (train/forward.py edge_schedule), so the per-step in-graph lexsort is
    wasted work — only edge *validity* is dynamic."""
    import numpy as np

    kk = np.asarray(kk)
    jj = np.asarray(jj)
    order = np.lexsort((jj, kk)).astype(np.int32)
    kk_s = kk[order]
    track_start = np.concatenate([[True], kk_s[1:] != kk_s[:-1]])
    return order, track_start


def neighbors_presorted(order, track_start, valid):
    """`neighbors` with the (kk, jj) sort precomputed (static schedule).

    order [E] int32: permutation sorting edges by (kk, jj); track_start [E]
    bool: True where a new patch track begins in sorted order. `valid` [E]
    is the only dynamic input; two masked segmented scans replace the sort.
    Returns (ix, jx) like `neighbors`.
    """
    import numpy as np

    E = order.shape[0]
    order_np = np.asarray(order)
    seg_np = (np.cumsum(np.asarray(track_start)) - 1).astype(np.int32)
    order = jnp.asarray(order_np, jnp.int32)
    valid_s = valid[order]
    idx = jnp.arange(E, dtype=jnp.int32)

    def seg_prev(vs, seg):
        # segmented exclusive cummax of valid positions. Offset trick:
        # segment bases increase, so a plain cummax never crosses back.
        base = jnp.asarray(seg, jnp.int32) * (E + 1)
        v = jnp.where(vs, base + idx, -1)
        c = jnp.concatenate([
            jnp.full((1,), -1, jnp.int32),
            jax.lax.cummax(v, axis=0)[:-1],
        ])
        return c - base, vs & (c >= base)

    prev_pos, prev_ok = seg_prev(valid_s, seg_np)

    # next = prev of the reversed sequence (segments stay contiguous;
    # renumber them so ids increase again)
    seg_rev = (seg_np[-1] - seg_np)[::-1]
    pos_r, ok_r = seg_prev(valid_s[::-1], seg_rev)
    next_pos = (E - 1) - pos_r[::-1]
    next_ok = ok_r[::-1]

    prev_idx = jnp.where(prev_ok, order[jnp.clip(prev_pos, 0, E - 1)], -1)
    next_idx = jnp.where(next_ok, order[jnp.clip(next_pos, 0, E - 1)], -1)
    ix = jnp.zeros(E, jnp.int32).at[order].set(prev_idx)
    jx = jnp.zeros(E, jnp.int32).at[order].set(next_idx)
    return ix, jx


def lattice_neighbors(cell_valid: jnp.ndarray, NI: int, T: int, M: int):
    """`neighbors` over the edge lattice [NI, T, M] — pure index arithmetic.

    A patch track is one lattice row (host, m); edges are ordered by t
    (t order == jj order), so the previous/next edge of cell (row, t) is the
    nearest valid cell at t' < t / t' > t in the same row. Two [NI, T]
    cumulative scans replace the flat path's 60k-element lexsort.

    cell_valid: [NI, T] bool. Returns (ix, jx) flat [NI*T*M] int32, -1 where
    no neighbour exists.
    """
    t = jnp.arange(T, dtype=jnp.int32)[None, :]
    # previous valid t (exclusive cummax of t-where-valid)
    tv = jnp.where(cell_valid, t, -1)
    prev_in = jax.lax.cummax(tv, axis=1)
    prev_t = jnp.concatenate(
        [jnp.full((NI, 1), -1, jnp.int32), prev_in[:, :-1]], axis=1
    )
    # next valid t (exclusive reverse cummin of t-where-valid)
    tw = jnp.where(cell_valid, t, T)
    next_in = jax.lax.cummin(tw, axis=1, reverse=True)
    next_t = jnp.concatenate(
        [next_in[:, 1:], jnp.full((NI, 1), T, jnp.int32)], axis=1
    )

    row = jnp.arange(NI, dtype=jnp.int32)[:, None, None]
    m = jnp.arange(M, dtype=jnp.int32)[None, None, :]

    def flat(tsel, ok):
        e = (row * T + tsel[:, :, None]) * M + m
        return jnp.where(ok[:, :, None], e, -1).reshape(-1).astype(jnp.int32)

    ix = flat(prev_t, prev_t >= 0)
    jx = flat(next_t, next_t < T)
    return ix, jx
