"""The edge-wise recurrent update operator (ref: ramp/net.py:34-90).

Operates on the fixed-capacity edge table unbatched: net [E, 384]. Temporal
neighbor message passing uses the argsort-based `ops.neighbors` (replacing
the reference's CPU round-trip through fastba.neighbors, ba.cpp:59-97);
SoftAgg pools over patch-track (kk) and frame-pair (ii*12345+jj) groups.
`valid` masks padding rows of the edge table — they contribute to nothing,
and their outputs must be ignored by the caller.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from ..ops.neighbors import (
    lattice_neighbors,
    neighbors,
    neighbors_presorted,
)
from .blocks import GatedResidual, SoftAgg, grad_clip

DIM = 384  # net.py:31


class Update(nn.Module):
    patch_size: int = 3

    @nn.compact
    def __call__(self, net, inp, corr, ii, jj, kk, valid=None, lattice=None,
                 static_sched=None, lattice_contig: bool = False):
        """`lattice=(NI, T, M)` (static): the edge set is the full lattice in
        row-major order — neighbour indices and both SoftAgg groups become
        dense lattice operations (axis reductions) instead of three
        E-element sorts per call. Numerics identical to the flat path.

        `static_sched`: for STATIC edge schedules (training forward), a
        dict with the neighbour sort precomputed on host (`order`,
        `track_start` from ops.neighbors.neighbors_static_order) and both
        SoftAgg group ids pre-compacted (`jx_kk`, `jx_ij`) — removes the
        three in-graph E-element sorts per step."""
        p = self.patch_size
        ln = lambda name: nn.LayerNorm(epsilon=1e-3, name=name)

        def corr_mlp(x):
            x = nn.Dense(DIM, name="corr_fc1")(x)
            x = nn.Dense(DIM, name="corr_fc2")(nn.relu(x))
            x = nn.LayerNorm(epsilon=1e-3, name="corr_ln")(x)
            return nn.Dense(DIM, name="corr_fc3")(nn.relu(x))

        def c1(x):
            return nn.Dense(DIM, name="c1_fc2")(nn.relu(nn.Dense(DIM, name="c1_fc1")(x)))

        def c2(x):
            return nn.Dense(DIM, name="c2_fc2")(nn.relu(nn.Dense(DIM, name="c2_fc1")(x)))

        if lattice is not None and inp.shape[0] != net.shape[0]:
            # lattice ctx arrives t-compressed as [NI*M, D] (it is
            # t-invariant: edge (i, t, m) reads patch (host_i, m)'s imap);
            # broadcast along T inside this add — no [E, D] gather
            NI_, T_, M_ = lattice
            assert inp.shape[0] == NI_ * M_, (inp.shape, lattice)
            net = (
                net.reshape(NI_, T_, M_, -1)
                + inp.reshape(NI_, 1, M_, -1)
                + corr_mlp(corr).reshape(NI_, T_, M_, -1)
            ).reshape(net.shape[0], -1)
        else:
            net = net + inp + corr_mlp(corr)
        net = ln("norm")(net)

        if lattice is not None and lattice_contig:
            # temporal neighbours over the lattice are t-axis shifts WHEN a
            # row's valid cells form a contiguous t-range — true in the VO
            # runtime by construction (_append_edges fills suffix/prefix
            # cells; the keyframe remap closes the evicted target's hole by
            # shifting j > k down) — so prev/next edge is exactly
            # (row, t -/+ 1, m). Shifted copies run at streaming bandwidth
            # where net[ix] gathers ran at the XLA gather rate (~5x slower
            # at [60k, 384]). For gapped validity use lattice_contig=False
            # (nearest-valid semantics, matching fastba ba.cpp:59-97).
            NI, T, M = lattice
            cellv = (
                jnp.ones((NI, T), bool) if valid is None
                else valid.reshape(NI, T, M)[:, :, 0]
            )
            nl = net.reshape(NI, T, M, -1)
            z = jnp.zeros_like(nl[:, :1])
            pm = jnp.concatenate(
                [jnp.zeros((NI, 1), bool), cellv[:, :-1]], axis=1
            ).astype(net.dtype)[:, :, None, None]
            nm = jnp.concatenate(
                [cellv[:, 1:], jnp.zeros((NI, 1), bool)], axis=1
            ).astype(net.dtype)[:, :, None, None]
            prev = jnp.concatenate([z, nl[:, :-1]], axis=1)
            net = net + c1((pm * prev).reshape(net.shape))
            # c2 reads the net AFTER the c1 update (ref: net.py:77-82)
            nl2 = net.reshape(NI, T, M, -1)
            nxt = jnp.concatenate([nl2[:, 1:], z], axis=1)
            net = net + c2((nm * nxt).reshape(net.shape))
        elif lattice is not None:
            NI, T, M = lattice
            cellv = (
                jnp.ones((NI, T), bool) if valid is None
                else valid.reshape(NI, T, M)[:, :, 0]
            )
            ix, jx = lattice_neighbors(cellv, NI, T, M)
            mask_ix = (ix >= 0).astype(net.dtype)[:, None]
            mask_jx = (jx >= 0).astype(net.dtype)[:, None]
            net = net + c1(mask_ix * net[ix])
            net = net + c2(mask_jx * net[jx])
        else:
            if static_sched is not None:
                vv = (jnp.ones(net.shape[0], bool) if valid is None else valid)
                ix, jx = neighbors_presorted(
                    static_sched["order"], static_sched["track_start"], vv
                )
            else:
                ix, jx = neighbors(kk, jj, valid=valid)
            mask_ix = (ix >= 0).astype(net.dtype)[:, None]
            mask_jx = (jx >= 0).astype(net.dtype)[:, None]
            net = net + c1(mask_ix * net[ix])
            net = net + c2(mask_jx * net[jx])

        kk_ids = kk if static_sched is None else static_sched["jx_kk"]
        ij_ids = (
            ii * 12345 + jj if static_sched is None
            else static_sched["jx_ij"]
        )
        net = net + SoftAgg(DIM, name="agg_kk")(
            net, kk_ids, valid=valid, lattice=lattice, axis=1,
            precompacted=static_sched is not None,
        )
        net = net + SoftAgg(DIM, name="agg_ij")(
            net, ij_ids, valid=valid, lattice=lattice, axis=2,
            precompacted=static_sched is not None,
        )

        net = ln("gru_ln1")(net)
        net = GatedResidual(DIM, name="gru_res1")(net)
        net = ln("gru_ln2")(net)
        net = GatedResidual(DIM, name="gru_res2")(net)

        delta = grad_clip(nn.Dense(2, name="d_fc")(nn.relu(net)))
        weight = nn.sigmoid(grad_clip(nn.Dense(2, name="w_fc")(nn.relu(net))))
        return net, (delta, weight)
