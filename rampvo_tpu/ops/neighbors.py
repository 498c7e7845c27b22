"""Temporal-neighbour indices for patch tracks.

Replaces the CPU round-trip in the reference (fastba/ba.cpp:59-97, called
from net.py:77): for every edge e, find the edge sharing the same patch kk
whose target frame jj immediately precedes / follows jj[e]. Implemented as a
single stable argsort on (kk, jj) — fully on-device, jit-safe, static shapes.
"""

from __future__ import annotations

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
