"""Segment (scatter) ops: softmax-weighted aggregation over index groups.

Replaces the reference's torch_scatter usage (ramp/blocks.py:33-69,
ramp/ba.py:40-46) with `jax.ops.segment_*` under static segment counts,
which is the jit-friendly formulation on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_softmax(
    x: jnp.ndarray,
    seg_ids: jnp.ndarray,
    num_segments: int,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Softmax over elements sharing a segment id.

    x: [E, D]; seg_ids: [E] int in [0, num_segments); valid: [E] bool mask.
    Invalid rows get weight 0 and do not affect their segment.
    """
    if valid is not None:
        x = jnp.where(valid[:, None], x, -jnp.inf)
    seg_max = jax.ops.segment_max(x, seg_ids, num_segments=num_segments)
    # empty segments produce -inf max; guard the gather
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    shifted = x - seg_max[seg_ids]
    ex = jnp.exp(shifted)
    if valid is not None:
        ex = jnp.where(valid[:, None], ex, 0.0)
    denom = jax.ops.segment_sum(ex, seg_ids, num_segments=num_segments)
    denom = jnp.maximum(denom, 1e-20)
    return ex / denom[seg_ids]


def segment_sum(x, seg_ids, num_segments, valid=None):
    if valid is not None:
        x = jnp.where(valid.reshape(valid.shape + (1,) * (x.ndim - 1)), x, 0.0)
    return jax.ops.segment_sum(x, seg_ids, num_segments=num_segments)


def segment_mean(x, seg_ids, num_segments, valid=None):
    s = segment_sum(x, seg_ids, num_segments, valid)
    ones = jnp.ones(x.shape[0], dtype=x.dtype)
    if valid is not None:
        ones = jnp.where(valid, ones, 0.0)
    cnt = jax.ops.segment_sum(ones, seg_ids, num_segments=num_segments)
    return s / jnp.maximum(cnt, 1.0).reshape(cnt.shape + (1,) * (x.ndim - 1))


def compact_ids(ids: jnp.ndarray, capacity: int) -> jnp.ndarray:
    """Map arbitrary non-negative ids to dense ranks (jit-safe `unique`).

    Equivalent to torch.unique(ids, return_inverse=True)[1] when the number
    of distinct values is ≤ capacity. Rank = number of distinct smaller ids,
    computed with a sort; O(E log E), fully static shapes.
    """
    order = jnp.argsort(ids)
    sorted_ids = ids[order]
    new_group = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), (sorted_ids[1:] != sorted_ids[:-1]).astype(jnp.int32)]
    )
    ranks_sorted = jnp.cumsum(new_group)
    ranks = jnp.zeros_like(ranks_sorted).at[order].set(ranks_sorted)
    return ranks
