"""The VO runtime: a fully-jitted, fixed-shape SLAM state machine.

Functional redesign of ramp/Ramp_vo.py. One jitted `vo_frame` handles an
entire frame: encode -> patch select/extract -> commit -> motion-probe gate
-> edge append -> (init burst | update + keyframe), with every
data-dependent decision expressed as `lax.cond`/`where` — after the jit
boundary there are NO host round-trips (the reference syncs with the host
every frame for the probe gate, keyframe decision and BA exception
handling, Ramp_vo.py:385,243,302).

Call stacks mirrored (see SURVEY.md §3.2):
  __call__      -> vo_frame / encode_only
  update()      -> _update        (reproject, corr, update net, BA)
  keyframe()    -> _keyframe      (motionmag gate, eviction, edge aging)
  terminate()   -> host-side delta-chain interpolation (Ramp_vo.py:155-173)
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ba import ba_infer
from ..geometry.projective import flow_mag_edges, transform_edges
from ..lie import ops as lops
from ..models import VONet
from ..models.encoders import MultiScaleEncoder, SingleScaleEncoder
from ..models.vonet import (
    extract_patches,
    filter_features,
    select_coords_event_bias,
    select_coords_gradient_bias,
    select_coords_random,
)
from ..ops.corr import avg_pool2d, corr as corr_xla, corr_region, corr_stack
from ..ops.corr_pallas import (
    GANG,
    RING_PAD,
    corr_lattice2_stacked,
    corr_lattice_fused2,
    corr_lattice_fused3,
    corr_lattice_fused4,
    folded_corr_perm,
    make_strips,
    paired_corr_perm,
)
from .config import VOConfig
from .state import VOState, edge_table, host_of_row, init_state

DIM = 384


# ---------------------------------------------------------------------------
# pure per-frame pieces (cfg static, closed over)
# ---------------------------------------------------------------------------

def make_enc_state(cfg: VOConfig, input_mode: str, ht: int, wd: int):
    """Encoder carry in the layout AND dtype the encode path for `cfg`
    expects: channel-major when the Pallas encoder resolves ON
    (PALLAS_ENCODER, "auto" = TPU backend), flax NHWC otherwise; bf16
    under MIXED_PRECISION (the state then stays bf16 across frames — the
    reference's fp16 autocast likewise carries half-precision hidden
    states, Ramp_vo.py:23 — skipping two full-state casts per frame).
    Use this instead of calling {Multi,Single}ScaleEncoder.init_state
    directly when the state feeds make_vo_frame / make_vo_frames_chunk."""
    dt = jnp.bfloat16 if cfg.MIXED_PRECISION else jnp.float32
    if cfg.pallas_encoder_on():
        from ..ops.encoder_pallas import (
            multiscale_init_state_cm,
            singlescale_init_state_cm,
        )

        if input_mode == "SingleScale":
            return singlescale_init_state_cm(ht, wd, dtype=dt)
        return multiscale_init_state_cm(ht, wd, dtype=dt)
    if input_mode == "SingleScale":
        return SingleScaleEncoder.init_state(ht, wd, dtype=dt)
    return MultiScaleEncoder.init_state(ht, wd, dtype=dt)


def _gather_pose(state: VOState, logical):
    """Pose of a logical keyframe (clamped gather through l2g)."""
    g = state.l2g[jnp.clip(logical, 0, state.l2g.shape[0] - 1)]
    return state.poses[jnp.clip(g, 0, state.poses.shape[0] - 1)]


def _patch_rows(state: VOState, kk_logical, M: int):
    """Global patch-buffer rows for logical patch ids."""
    host = kk_logical // M
    g = state.l2g[jnp.clip(host, 0, state.l2g.shape[0] - 1)]
    return g * M + kk_logical % M


def _patches_rows(state: VOState, rows, P: int = 3):
    """Interleaved [E, 3, P, P] patches for global patch rows, rebuilt from
    the planar buffers (legacy/non-lattice consumers: probe edges, exact-XLA
    fallback, oracle paths — NOT the hot lattice path)."""
    F, M = state.pat_d.shape
    PP = P * P
    gf = jnp.clip(rows // M, 0, F - 1)
    m = jnp.clip(rows % M, 0, M - 1)
    px = state.pat_x.reshape(F, M, PP)[gf, m].reshape(-1, P, P)
    py = state.pat_y.reshape(F, M, PP)[gf, m].reshape(-1, P, P)
    pd = jnp.broadcast_to(
        state.pat_d[gf, m][:, None, None], px.shape
    )
    return jnp.stack([px, py, pd], axis=1)


def _motion_model_pose(cfg: VOConfig, state: VOState):
    """Damped-linear extrapolation (ref: Ramp_vo.py:356-366)."""
    P1 = _gather_pose(state, state.n - 1)
    P2 = _gather_pose(state, state.n - 2)
    xi = cfg.MOTION_DAMPING * lops.se3_log(
        lops.se3_mul(P1[None], lops.se3_inv(P2[None]))
    )[0]
    pred = lops.se3_mul(lops.se3_exp(xi[None]), P1[None])[0]
    ident = jnp.zeros(7, jnp.float32).at[6].set(1.0)
    return jnp.where(state.n > 1, pred, ident)


def _commit(cfg: VOConfig, state: VOState, fmap, gmap, imap_vec, patches_new,
            clr, intrinsics) -> VOState:
    """Write the new frame into buffers at global row g = counter
    (ref: Ramp_vo.py:344-383). Does NOT advance n (the probe gate decides)."""
    M, L, MEM, F = cfg.M, cfg.BUFFER_SIZE, cfg.MEM, cfg.MAX_FRAMES
    g = state.counter
    n = state.n
    fdt = state.imap_r.dtype

    rng, k1 = jax.random.split(state.rng)

    # pose via motion model
    pose_g = _motion_model_pose(cfg, state)
    poses = state.poses.at[g].set(pose_g)

    # depth init: random pre-init, median of last 3 frames after
    # (ref: Ramp_vo.py:368-373). The reference takes the median over the
    # full [3M, P, P] (depth replicated per pixel) — replicate to match.
    P = patches_new.shape[-1]
    PP = P * P
    g3 = state.l2g[jnp.clip(n - 3 + jnp.arange(3), 0, L - 1)]
    d3 = state.pat_d[jnp.clip(g3, 0, F - 1)]                 # [3, M]
    med = jnp.median(jnp.broadcast_to(d3[:, :, None], (3, M, PP)))
    rand_d = jax.random.uniform(k1, (M,))
    d0 = jnp.where(state.initialized, med, rand_d)
    pat_x = state.pat_x.at[g].set(patches_new[0, :, 0].reshape(M * PP))
    pat_y = state.pat_y.at[g].set(patches_new[0, :, 1].reshape(M * PP))
    pat_d = state.pat_d.at[g].set(d0)
    pat_cx = state.pat_cx.at[g].set(patches_new[0, :, 0, P // 2, P // 2])
    pat_cy = state.pat_cy.at[g].set(patches_new[0, :, 1, P // 2, P // 2])
    colors = state.colors.at[g].set(clr[0])

    # free ring slots of frames that aged out of the feature window
    old = (jnp.arange(L) < n - cfg.FEATURE_WINDOW) & (state.slotmap >= 0)
    slot_free = state.slot_free.at[
        jnp.where(old, state.slotmap, MEM)
    ].set(True, mode="drop")
    slotmap = jnp.where(old, -1, state.slotmap)

    # allocate a slot for the new frame and fill the rings
    s = jnp.argmax(slot_free)
    slot_free = slot_free.at[s].set(False)
    slotmap = slotmap.at[n].set(s)

    imap_r = state.imap_r.at[s].set(imap_vec[0].astype(fdt))
    gmap_r = state.gmap_r.at[s].set(gmap[0].astype(fdt))
    # fmap rings are stored pre-padded (ops/corr_pallas.RING_PAD): write the
    # slot interior only — the border stays zero for the kernels' clamped
    # tile slices
    fmap1_r = jax.lax.dynamic_update_slice(
        state.fmap1_r, fmap.astype(fdt), (s, RING_PAD, RING_PAD, 0)
    )
    fmap2_r = jax.lax.dynamic_update_slice(
        state.fmap2_r, avg_pool2d(fmap, 4).astype(fdt),
        (s, RING_PAD, RING_PAD, 0),
    )

    # strip-major views for the fused3 kernel: rebuild the new slot only
    # (~28 MB write/frame; the kernel then reads tiles with zero relayout)
    strips1_r, strips2_r = state.strips1_r, state.strips2_r
    if cfg.CORR_LAYOUT in ("fused3", "fused4"):
        for ring, strips_attr in ((fmap1_r, "strips1_r"),
                                  (fmap2_r, "strips2_r")):
            slot = jax.lax.dynamic_slice(
                ring, (s, 0, 0, 0), (1,) + ring.shape[1:]
            )
            new = make_strips(slot)
            if strips_attr == "strips1_r":
                strips1_r = jax.lax.dynamic_update_slice(
                    strips1_r, new, (s, 0, 0, 0)
                )
            else:
                strips2_r = jax.lax.dynamic_update_slice(
                    strips2_r, new, (s, 0, 0, 0)
                )

    # provisional logical registration (valid only if the frame is kept)
    l2g = state.l2g.at[n].set(g)

    return state.replace(
        poses=poses, pat_x=pat_x, pat_y=pat_y, pat_d=pat_d,
        pat_cx=pat_cx, pat_cy=pat_cy, colors=colors,
        slot_free=slot_free, slotmap=slotmap,
        imap_r=imap_r, gmap_r=gmap_r, fmap1_r=fmap1_r, fmap2_r=fmap2_r,
        strips1_r=strips1_r, strips2_r=strips2_r,
        l2g=l2g, counter=g + 1, rng=rng,
        intrinsics=intrinsics / 4.0,
    )


def _reproject_edges(cfg: VOConfig, state: VOState, ii, jj, kk):
    M = cfg.M
    L = state.l2g.shape[0]
    F = state.poses.shape[0]
    poses_i = state.poses[jnp.clip(state.l2g[jnp.clip(ii, 0, L - 1)], 0, F - 1)]
    poses_j = state.poses[jnp.clip(state.l2g[jnp.clip(jj, 0, L - 1)], 0, F - 1)]
    rows = jnp.clip(_patch_rows(state, kk, M), 0, F * M - 1)
    return transform_edges(poses_i, poses_j, _patches_rows(state, rows),
                           state.intrinsics)


def _quat_project(Gij, px, py, d, intrinsics):
    """Pinhole reprojection of planar pixel arrays through per-row relative
    poses. Gij [R, 7]; px/py/d broadcastable to [R, K]. Returns u, v [R, K].
    Structure-of-arrays quaternion chain — every intermediate has a wide
    minor dim, never the [..., P, P, (2|4)] interleaved forms whose tiny
    minor dims XLA tiles to (8, 128) at ~170x physical padding."""
    fx, fy, cx, cy = intrinsics
    x0 = (px - cx) / fx
    y0 = (py - cy) / fy
    tx_, ty_, tz_ = (Gij[..., 0:1], Gij[..., 1:2], Gij[..., 2:3])
    qx, qy, qz, qw = (
        Gij[..., 3:4], Gij[..., 4:5], Gij[..., 5:6], Gij[..., 6:7]
    )
    # quat_act with v = (x0, y0, 1)  (uv = 2 qv x v; out = v + qw uv + qv x uv)
    uvx = 2.0 * (qy - qz * y0)
    uvy = 2.0 * (qz * x0 - qx)
    uvz = 2.0 * (qx * y0 - qy * x0)
    X1 = x0 + qw * uvx + (qy * uvz - qz * uvy) + d * tx_
    Y1 = y0 + qw * uvy + (qz * uvx - qx * uvz) + d * ty_
    Z1 = 1.0 + qw * uvz + (qx * uvy - qy * uvx) + d * tz_
    Z = jnp.maximum(Z1, 0.1)
    u = fx * (X1 / Z) + cx
    v = fy * (Y1 / Z) + cy
    return u, v


def _reproject_lattice_planar(cfg: VOConfig, state: VOState):
    """PLANAR lattice reprojection: (u, v [NC, M*PP], uc, vc [NC, M]).

    Exploits two lattice invariants the per-edge path paid for on every
    update: patch data depends only on (host row, m) — gathered once per
    HOST ROW ([NI] frame rows of the planar buffers) instead of per edge
    (a T x redundant [E, 3, P, P] gather) — and all edges of a cell share
    the relative pose. Invalid cells produce garbage coords; every consumer
    masks them (corr vmask, BA weight gates), matching the sanitized
    edge_table semantics."""
    M, NI, T, r = cfg.M, cfg.NI, cfg.T, cfg.PATCH_LIFETIME
    L = state.l2g.shape[0]
    F = state.poses.shape[0]
    n = state.n
    MPP = state.pat_x.shape[1]
    PP = MPP // M

    from .state import host_of_row

    rows = jnp.arange(NI, dtype=jnp.int32)
    hosts = host_of_row(rows, n, NI)                           # [NI]
    gh = jnp.clip(state.l2g[jnp.clip(hosts, 0, L - 1)], 0, F - 1)
    px = state.pat_x[gh]                                       # [NI, MPP]
    py = state.pat_y[gh]
    pd = state.pat_d[gh]                                       # [NI, M]

    jj_c = hosts[:, None] + (jnp.arange(T, dtype=jnp.int32)[None, :]
                             - (r - 1))                        # [NI, T]
    pi = state.poses[gh]                                       # [NI, 7]
    gj = jnp.clip(state.l2g[jnp.clip(jj_c, 0, L - 1)], 0, F - 1)
    pj = state.poses[gj]                                       # [NI, T, 7]
    Gij = lops.se3_mul(pj, lops.se3_inv(pi)[:, None, :])       # [NI, T, 7]

    dpp = jnp.broadcast_to(pd[:, :, None], (NI, M, PP)).reshape(NI, 1, MPP)
    u, v = _quat_project(
        Gij, px[:, None, :], py[:, None, :], dpp, state.intrinsics
    )                                                          # [NI, T, MPP]
    uc, vc = _quat_project(
        Gij, state.pat_cx[gh][:, None, :], state.pat_cy[gh][:, None, :],
        pd[:, None, :], state.intrinsics,
    )                                                          # [NI, T, M]
    NC = NI * T
    return (u.reshape(NC, MPP), v.reshape(NC, MPP),
            uc.reshape(NC, M), vc.reshape(NC, M))


def _reproject_edges_lattice(cfg: VOConfig, state: VOState, ii, jj, kk):
    """Interleaved [E, P, P, 2] coords for the full lattice edge set (oracle
    and non-fused2 layouts; the fused2 path consumes the planar form
    directly). One stack/materialization at the boundary."""
    M, NI, T = cfg.M, cfg.NI, cfg.T
    MPP = state.pat_x.shape[1]
    PP = MPP // M
    P = int(round(PP ** 0.5))
    u, v, _, _ = _reproject_lattice_planar(cfg, state)
    return jnp.stack([u, v], axis=-1).reshape(NI * T * M, P, P, 2)


def _fold_corr_fc1(params, layout: str = "folded"):
    """Permute corr_fc1's kernel rows so it consumes the kernel-native corr
    layout (models.vonet.fold_corr_fc1 — shared with the training path)."""
    from ..models.vonet import fold_corr_fc1

    return fold_corr_fc1(params, layout)


def _resolve_corr_impl(cfg: VOConfig) -> str:
    impl = cfg.CORR_IMPL
    if impl == "auto":
        impl = "lattice" if jax.default_backend() == "tpu" else "xla"
    if impl.startswith("lattice") and cfg.M % GANG != 0:
        impl = "pallas"  # lattice kernel gangs require M % 8 == 0
    return impl


def _edge_corr_ctx_lattice(cfg: VOConfig, state: VOState, ii, jj, kk):
    """Correlation + context for the FULL edge set via the lattice kernel.

    Returns (target [E, 2] center reprojections, corr_in, ctx). The default
    fused2 layout runs fully PLANAR: reprojection produces (u, v, uc, vc)
    planar arrays and the kernel wrapper packs its scalar tables from them
    directly — the interleaved [E, P, P, 2] coords array (whose (3, 2)
    minor dims XLA tiles to (8, 128) at ~170x physical padding) never
    exists (ref semantics: Ramp_vo.py:175-182)."""
    M, MEM, NI, T = cfg.M, cfg.MEM, cfg.NI, cfg.T
    P = state.gmap_r.shape[-3]
    L = state.l2g.shape[0]

    h4, w4 = state.hw4
    if cfg.CORR_LAYOUT in ("fused2", "fused3", "fused4") \
            and cfg.CELL_REPROJECT:
        u, v, uc, vc = _reproject_lattice_planar(cfg, state)
        target = jnp.stack(
            [uc.reshape(-1), vc.reshape(-1)], axis=-1
        )                                                   # [E, 2]
        if cfg.CORR_LAYOUT == "fused4":
            corr_in = corr_lattice_fused4(
                state.gmap_r, state.strips1_r, state.strips2_r,
                (u, v, uc, vc), state.cell_valid,
                state.n, state.slotmap, cfg.PATCH_LIFETIME, 3,
                interpret=cfg.CORR_IMPL == "lattice_interpret",
                prestripped=True, hw=(h4, w4, h4 // 4, w4 // 4),
                lat=(NI, T, M, P),
            )
        elif cfg.CORR_LAYOUT == "fused3":
            corr_in = corr_lattice_fused3(
                state.gmap_r, state.strips1_r, state.strips2_r,
                (u, v, uc, vc), state.cell_valid,
                state.n, state.slotmap, cfg.PATCH_LIFETIME, 3,
                interpret=cfg.CORR_IMPL == "lattice_interpret",
                prestripped=True, hw=(h4, w4, h4 // 4, w4 // 4),
                lat=(NI, T, M, P),
            )
        else:
            corr_in = corr_lattice_fused2(
                state.gmap_r, state.fmap1_r, state.fmap2_r,
                (u, v, uc, vc), state.cell_valid,
                state.n, state.slotmap, cfg.PATCH_LIFETIME, 3,
                interpret=cfg.CORR_IMPL == "lattice_interpret",
                prepadded=True, hw=(h4, w4, h4 // 4, w4 // 4),
                lat=(NI, T, M, P),
            )
        kk_rows = kk.reshape(NI, T, M)[:, 0, :].reshape(-1)
        slot_k = state.slotmap[jnp.clip(kk_rows // M, 0, L - 1)]
        gidx = jnp.clip(slot_k, 0, MEM - 1) * M + kk_rows % M
        ctx = state.imap_r.reshape(MEM * M, -1)[gidx].astype(jnp.float32)
        return target, corr_in, ctx

    if cfg.CELL_REPROJECT:
        coords = _reproject_edges_lattice(cfg, state, ii, jj, kk)
    else:
        coords = _reproject_edges(cfg, state, ii, jj, kk)
    if cfg.CORR_LAYOUT == "fused4":
        corr_in = corr_lattice_fused4(
            state.gmap_r, state.strips1_r, state.strips2_r,
            coords.reshape(NI, T, M, P, P, 2), state.cell_valid,
            state.n, state.slotmap, cfg.PATCH_LIFETIME, 3,
            interpret=cfg.CORR_IMPL == "lattice_interpret",
            prestripped=True, hw=(h4, w4, h4 // 4, w4 // 4),
        )
    elif cfg.CORR_LAYOUT == "fused3":
        corr_in = corr_lattice_fused3(
            state.gmap_r, state.strips1_r, state.strips2_r,
            coords.reshape(NI, T, M, P, P, 2), state.cell_valid,
            state.n, state.slotmap, cfg.PATCH_LIFETIME, 3,
            interpret=cfg.CORR_IMPL == "lattice_interpret",
            prestripped=True, hw=(h4, w4, h4 // 4, w4 // 4),
        )
    elif cfg.CORR_LAYOUT == "fused2":
        # paired 128-lane layout: the kernel emits 8x8-compacted,
        # bilinear-blended windows directly (binary-roll alignment +
        # constant 0/1 compaction matmul in-kernel). Window permute +
        # level interleave fold into corr_fc1's kernel (paired_corr_perm).
        corr_in = corr_lattice_fused2(
            state.gmap_r, state.fmap1_r, state.fmap2_r,
            coords.reshape(NI, T, M, P, P, 2), state.cell_valid,
            state.n, state.slotmap, cfg.PATCH_LIFETIME, 3,
            interpret=cfg.CORR_IMPL == "lattice_interpret",
            prepadded=True, hw=(h4, w4, h4 // 4, w4 // 4),
        )
    else:
        # folded layout: the window transpose + level interleave fold into
        # corr_fc1's kernel (ops/corr_pallas.folded_corr_perm)
        corr_in = corr_lattice2_stacked(
            state.gmap_r, state.fmap1_r, state.fmap2_r,
            coords.reshape(NI, T, M, P, P, 2), state.cell_valid,
            state.n, state.slotmap, cfg.PATCH_LIFETIME, 3,
            interpret=cfg.CORR_IMPL == "lattice_interpret",
            prepadded=True, hw=(h4, w4, h4 // 4, w4 // 4), folded=True,
        )

    # ctx is t-invariant on the lattice (edge (i, t, m) reads patch
    # (host_i, m)'s imap): gather only the [NI*M] rows and let the update
    # net broadcast along T inside its first add — the full [E, 384]
    # gather was ~1.5 ms of pure HBM gather traffic per update
    kk_rows = kk.reshape(NI, T, M)[:, 0, :].reshape(-1)   # [NI*M]
    slot_k = state.slotmap[jnp.clip(kk_rows // M, 0, L - 1)]
    gidx = jnp.clip(slot_k, 0, MEM - 1) * M + kk_rows % M
    ctx = state.imap_r.reshape(MEM * M, -1)[gidx].astype(jnp.float32)
    target = coords[:, P // 2, P // 2, :]
    return target, corr_in, ctx


def _edge_corr_ctx(cfg: VOConfig, state: VOState, ii, jj, kk):
    """Correlation features + context for an edge set
    (ref: Ramp_vo.py:175-182, net ctx gather :282)."""
    M, MEM = cfg.M, cfg.MEM
    P = state.gmap_r.shape[-3]
    L = state.l2g.shape[0]
    F = state.poses.shape[0]

    poses_i = state.poses[jnp.clip(state.l2g[jnp.clip(ii, 0, L - 1)], 0, F - 1)]
    poses_j = state.poses[jnp.clip(state.l2g[jnp.clip(jj, 0, L - 1)], 0, F - 1)]
    rows = jnp.clip(_patch_rows(state, kk, M), 0, F * M - 1)
    patches_e = _patches_rows(state, rows)

    coords = transform_edges(poses_i, poses_j, patches_e, state.intrinsics)

    slot_k = state.slotmap[jnp.clip(kk // M, 0, L - 1)]
    gidx = jnp.clip(slot_k, 0, MEM - 1) * M + kk % M
    slot_j = jnp.clip(state.slotmap[jnp.clip(jj, 0, L - 1)], 0, MEM - 1)

    gmap_flat = state.gmap_r.reshape(MEM * M, P, P, 128)
    # the rings are stored pre-padded; the non-lattice kernels take
    # unpadded maps (cheap here: this path runs on M-sized probe edge sets
    # pre-init, or on non-TPU backends)
    h4, w4 = state.hw4
    fmap1 = state.fmap1_r[
        :, RING_PAD:RING_PAD + h4, RING_PAD:RING_PAD + w4
    ]
    fmap2 = state.fmap2_r[
        :, RING_PAD:RING_PAD + h4 // 4, RING_PAD:RING_PAD + w4 // 4
    ]
    impl = _resolve_corr_impl(cfg)
    if impl in ("lattice_interpret", "pallas", "lattice"):
        # exact XLA for arbitrary edge lists. corr_pallas2 used to serve
        # this path on TPU, but its per-window DYNAMIC-amount pltpu.roll
        # silently miscompiles on real hardware (r03 finding — interpret
        # mode green, 1.0 rel garbage on chip; scripts/
        # check_layouts_onchip.py); the probe edge set is M-sized and
        # pre-init only, so the exact XLA gather costs nothing here.
        impl = "xla"
    if impl == "region":
        E = coords.shape[0]
        ch = 8 if E % 8 == 0 and E > 16384 else 1
        c1 = corr_region(gmap_flat, fmap1, coords, gidx, slot_j, 3,
                         chunks=ch)
        c2 = corr_region(gmap_flat, fmap2, coords / 4.0, gidx,
                         slot_j, 3, chunks=ch)
    else:
        c1 = corr_xla(gmap_flat, fmap1, coords, gidx, slot_j, 3)
        c2 = corr_xla(gmap_flat, fmap2, coords / 4.0, gidx, slot_j, 3)
    corr_in = corr_stack(c1, c2).astype(jnp.float32)

    ctx = state.imap_r.reshape(MEM * M, -1)[gidx].astype(jnp.float32)
    target = coords[:, P // 2, P // 2, :]
    return target, corr_in, ctx


def _probe_median(cfg: VOConfig, update_fn, params, state: VOState):
    """Median predicted flow for the new (uncommitted) frame
    (ref: Ramp_vo.py:210-225)."""
    M = cfg.M
    n = state.n
    kk = (n - 1) * M + jnp.arange(M, dtype=jnp.int32)
    ii = jnp.full((M,), n - 1, jnp.int32)
    jj = jnp.full((M,), n, jnp.int32)

    # the probe target frame n was provisionally registered by _commit
    _target, corr_in, ctx = _edge_corr_ctx(cfg, state, ii, jj, kk)
    net0 = jnp.zeros((M, DIM), jnp.float32)
    _, (delta, _w) = update_fn(params, net0, ctx, corr_in, ii, jj, kk, None)
    return jnp.quantile(jnp.linalg.norm(delta, axis=-1), 0.5)


def _append_edges(cfg: VOConfig, state: VOState) -> VOState:
    """Add forward/backward factors for the newly committed frame
    (ref: Ramp_vo.py:194-201,312-325). Called AFTER n was advanced.

    Lattice formulation: the new frame nf = n-1 takes host row nf % NI;
    backward edges fill its cells t in [0, r-1] (targets [n-r, n-1]),
    forward edges add one cell t = nf - i + (r-1) to each older host row
    — static-pattern writes instead of the reference's list concatenation
    (and instead of a 60k free-slot argsort per frame)."""
    M, r, NI, T = cfg.M, cfg.PATCH_LIFETIME, cfg.NI, cfg.T
    n = state.n
    nf = n - 1
    rf = jnp.mod(nf, NI)

    # the reused row's previous occupant (host nf - NI) aged out: clear it
    cell_valid = state.cell_valid.at[rf].set(False)
    net = state.net.at[rf].set(0.0)
    lw = state.last_weight.at[rf].set(0.0)

    # backward: host nf -> targets [n-r, n-1]
    tb = jnp.arange(r, dtype=jnp.int32)
    ok_b = (nf + tb - (r - 1)) >= 0
    cell_valid = cell_valid.at[rf, :r].set(ok_b)

    # forward: hosts [n-r, n-2] -> target nf
    hosts = nf - 1 - jnp.arange(r - 1, dtype=jnp.int32)
    tf = nf - hosts + (r - 1)
    ok_f = hosts >= 0
    rows = jnp.where(ok_f, jnp.mod(hosts, NI), NI)
    cell_valid = cell_valid.at[rows, tf].set(True, mode="drop")
    net = net.at[rows, tf].set(0.0, mode="drop")
    lw = lw.at[rows, tf].set(0.0, mode="drop")

    return state.replace(cell_valid=cell_valid, net=net, last_weight=lw)


def _update(cfg: VOConfig, update_fn, params, state: VOState,
            oracle=None) -> VOState:
    """One VO update: reproject -> corr -> update net -> BA
    (ref: Ramp_vo.py:276-310).

    `oracle(state, ii, jj, kk, coords) -> (delta, weight)`: optional
    replacement for the update network — used by runtime-correctness tests
    to drive BA with ground-truth targets."""
    M, PW = cfg.M, cfg.POSE_WINDOW
    P = state.gmap_r.shape[-3]
    F = state.poses.shape[0]
    L = state.l2g.shape[0]
    n = state.n
    hw4 = state.hw4

    ii, jj, kk, valid = edge_table(cfg, n, state.cell_valid)
    net_flat = state.net.reshape(-1, DIM)

    if oracle is None:
        if _resolve_corr_impl(cfg).startswith("lattice"):
            target0, corr_in, ctx = _edge_corr_ctx_lattice(
                cfg, state, ii, jj, kk
            )
            lattice = (cfg.NI, cfg.T, cfg.M)
        else:
            target0, corr_in, ctx = _edge_corr_ctx(cfg, state, ii, jj, kk)
            lattice = None
        net_flat, (delta, weight) = update_fn(
            params, net_flat, ctx, corr_in, ii, jj, kk, valid, lattice
        )
    else:
        if (_resolve_corr_impl(cfg).startswith("lattice")
                and cfg.CELL_REPROJECT):
            coords = _reproject_edges_lattice(cfg, state, ii, jj, kk)
        else:
            coords = _reproject_edges(cfg, state, ii, jj, kk)
        delta, weight = oracle(state, ii, jj, kk, coords)
        target0 = coords[:, P // 2, P // 2, :]

    target = target0 + delta
    weight = filter_features(weight, target, hw4)
    weight = jnp.where(valid[:, None], weight, 0.0)

    # ---- BA over the trailing window ----
    base = jnp.maximum(n - PW, 0)
    win_log = base + jnp.arange(PW)
    win_ok = win_log < n
    win_g = state.l2g[jnp.clip(win_log, 0, L - 1)]
    win_gc = jnp.clip(jnp.where(win_ok, win_g, 0), 0, F - 1)
    posew = state.poses[win_gc]

    # window patch CENTERS from the planar buffers ([PW] frame-row gathers
    # — BA only ever reads centers + per-patch depth, ba_cuda.cu:316-338)
    cwin = jnp.stack(
        [state.pat_cx[win_gc], state.pat_cy[win_gc], state.pat_d[win_gc]],
        axis=-1,
    ).reshape(PW * M, 3)

    t0 = jnp.maximum(jnp.where(state.initialized, n - cfg.OPTIMIZATION_WINDOW, 1), 1)
    if _resolve_corr_impl(cfg).startswith("lattice"):
        # patch tracks are lattice rows: BA's per-patch reduction becomes a
        # dense t-axis sum + a window-frame row gather (ba/core.py _assemble)
        ba_lat = (cfg.NI, cfg.T, M)
        wf = base + jnp.arange(PW, dtype=jnp.int32)     # window frames
        wrow = jnp.mod(wf, cfg.NI)
        held = host_of_row(wrow, n, cfg.NI) == wf       # row holds frame wf
        win_rows = jnp.where(held & (wf < n), wrow, -1)
    else:
        ba_lat, win_rows = None, None
    posew2, dwin2 = ba_infer(
        posew, cwin, state.intrinsics, target, weight,
        jnp.float32(1e-4),
        ii - base, jj - base, kk - base * M,
        t0 - base, n - base,
        N=cfg.OPTIMIZATION_WINDOW, M=PW * M, iterations=cfg.BA_ITERS,
        valid=valid,
        lattice=ba_lat, win_rows=win_rows,
        cell_linearize=cfg.CELL_LINEARIZE,
    )

    poses = state.poses.at[jnp.where(win_ok, win_g, F)].set(posew2, mode="drop")
    pat_d = state.pat_d.at[jnp.where(win_ok, win_g, F)].set(
        dwin2.reshape(PW, M), mode="drop"
    )

    return state.replace(
        net=net_flat.reshape(state.net.shape),
        last_weight=weight.reshape(state.last_weight.shape),
        poses=poses, pat_d=pat_d,
    )


def _keyframe(cfg: VOConfig, state: VOState) -> VOState:
    """Evict a redundant keyframe and age out old edges
    (ref: Ramp_vo.py:237-274). Branchless except the eviction remap
    (lax.cond — only eviction frames pay for moving lattice rows)."""
    M, L, MEM, NI, T = cfg.M, cfg.BUFFER_SIZE, cfg.MEM, cfg.NI, cfg.T
    r = cfg.PATCH_LIFETIME
    F = state.poses.shape[0]
    n = state.n
    i = n - cfg.KEYFRAME_INDEX - 1
    j = n - cfg.KEYFRAME_INDEX + 1

    # motion magnitude between logical frames a and b (both directions):
    # the (a, b) edges are exactly one lattice cell — a direct slice
    # (the unstructured table needed a 60k nonzero search here)
    def cell_mean(a, b):
        row = jnp.mod(a, NI)
        t = b - a + (r - 1)
        ok = (
            state.cell_valid[row, jnp.clip(t, 0, T - 1)]
            & (t >= 0) & (t < T)
            & (host_of_row(row, n, NI) == a)
        )
        pa = _gather_pose(state, a)
        pb = _gather_pose(state, b)
        rows = jnp.clip(
            _patch_rows(state, a * M + jnp.arange(M, dtype=jnp.int32), M),
            0, F * M - 1,
        )
        flow = flow_mag_edges(
            jnp.broadcast_to(pa, (M, 7)), jnp.broadcast_to(pb, (M, 7)),
            _patches_rows(state, rows), state.intrinsics, beta=0.5,
        ).mean()
        return jnp.where(ok, flow, 0.0)

    m = 0.5 * (cell_mean(i, j) + cell_mean(j, i))
    evict = m < cfg.KEYFRAME_THRESH
    k = n - cfg.KEYFRAME_INDEX

    # trajectory delta for the removed frame (ref: Ramp_vo.py:245-249)
    t0g = state.l2g[jnp.clip(k - 1, 0, L - 1)]
    t1g = state.l2g[jnp.clip(k, 0, L - 1)]
    dP = lops.se3_mul(
        state.poses[jnp.clip(t1g, 0, F - 1)][None],
        lops.se3_inv(state.poses[jnp.clip(t0g, 0, F - 1)][None]),
    )[0]
    didx = jnp.where(evict, t1g, F)
    delta_parent = state.delta_parent.at[didx].set(t0g, mode="drop")
    delta_dP = state.delta_dP.at[didx].set(dP, mode="drop")

    # edge removal + index shift (ref: Ramp_vo.py:251-256). The reference
    # renumbers ii/jj/kk in place; with derived lattice indices the shift
    # becomes a row/cell remap: new cell (i', t') pulls from old cell
    # (i mod NI, j - i + r - 1) with i = i' + (i' >= k), j = j' + (j' >= k).
    # Unconditional (the indices are the identity when not evicting):
    # a lax.cond here forces XLA to copy the big net/last_weight operands
    # through the conditional every frame anyway.
    n_new = n - evict.astype(jnp.int32)

    i_row = jnp.arange(NI, dtype=jnp.int32)[:, None]
    tt = jnp.arange(T, dtype=jnp.int32)[None, :]
    sh = evict.astype(jnp.int32)
    i_new = host_of_row(i_row, n_new, NI) + 0 * tt
    j_new = i_new + tt - (r - 1)
    i_old = i_new + sh * (i_new >= k).astype(jnp.int32)
    j_old = j_new + sh * (j_new >= k).astype(jnp.int32)
    t_old = j_old - i_old + (r - 1)
    okc = (
        (t_old >= 0) & (t_old < T) & (i_old >= 0)
        & (~evict | ((i_old != k) & (j_old != k)))
    )
    src = jnp.mod(i_old, NI) * T + jnp.clip(t_old, 0, T - 1)
    cell_valid = (
        state.cell_valid.reshape(NI * T)[src] & okc
    ).reshape(NI, T)
    net = state.net.reshape(NI * T, M, -1)[src].reshape(state.net.shape)
    lw = state.last_weight.reshape(NI * T, M, 2)[src].reshape(
        state.last_weight.shape
    )

    # map shifts (replaces the reference's physical buffer moves :258-268)
    idx = jnp.arange(L)
    shifted = jnp.roll(state.l2g, -1)
    l2g = jnp.where(evict & (idx >= k), shifted, state.l2g)
    freed_slot = state.slotmap[jnp.clip(k, 0, L - 1)]
    slot_free = state.slot_free.at[
        jnp.where(evict & (freed_slot >= 0), freed_slot, MEM)
    ].set(True, mode="drop")
    slotmap = jnp.where(evict & (idx >= k), jnp.roll(state.slotmap, -1), state.slotmap)

    # age out edges whose host patch frame left the removal window (:273-274)
    host_row = host_of_row(jnp.arange(NI, dtype=jnp.int32), n_new, NI)
    cell_valid = cell_valid & (host_row >= n_new - cfg.REMOVAL_WINDOW)[:, None]

    return state.replace(
        cell_valid=cell_valid, net=net, last_weight=lw, n=n_new,
        l2g=l2g, slotmap=slotmap, slot_free=slot_free,
        delta_parent=delta_parent, delta_dP=delta_dP,
    )


# ---------------------------------------------------------------------------
# frame-level composition
# ---------------------------------------------------------------------------

def make_vo_frame(cfg: VOConfig, vonet: VONet, event_bias: bool = True,
                  oracle=None, jit_wrap: bool = True):
    """Build the single jitted per-frame function.

    vo_frame(params, state, events [T,H,W,Ce], images [1,H,W,3], mask [T])
      -> new state. `mask` must have >= 1 true entry (host routes
      events-only frames to `make_encode_only`). `jit_wrap=False` returns
    the raw function (used by `make_vo_frames_chunk`'s scan).
    """

    def encode_fn(params, events, images, mask, enc_state):
        # a state already carried in bf16 (make_enc_state under
        # MIXED_PRECISION) skips both per-frame casts — the reference's
        # autocast likewise carries fp16 hidden states across frames
        state_bf16 = all(
            x.dtype == jnp.bfloat16
            for x in jax.tree_util.tree_leaves(enc_state)
        )
        if cfg.MIXED_PRECISION:
            # the reference encodes under fp16 autocast at inference
            # (Ramp_vo.py:23,331-337)
            params = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x,
                params,
            )
            events = events.astype(jnp.bfloat16)
            images = images.astype(jnp.bfloat16)
            if not state_bf16:
                enc_state = jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.bfloat16), enc_state
                )
        if (cfg.pallas_encoder_on() and vonet.input_mode == "MultiScale"
                and events.shape[0] == 1):
            # channel-major Pallas LSTM+fold chain (ops/encoder_pallas.py);
            # heads stay flax; Patchifier's /4 applied here
            from ..ops.encoder_pallas import pallas_multiscale_encode

            fmap, imap, enc2 = pallas_multiscale_encode(
                params["params"]["patchify"]["encoder"],
                events, images, mask, enc_state,
                interpret=jax.default_backend() != "tpu",
            )
            fmap = fmap / 4.0
            imap = imap / 4.0
        elif (cfg.pallas_encoder_on() and vonet.input_mode == "SingleScale"
                and events.shape[0] == 1):
            # carried channel-major kernel; enc_state is the CM form
            # (ops/encoder_pallas.singlescale_init_state_cm)
            from ..ops.encoder_pallas import pallas_singlescale_encode

            fmap, imap, enc2 = pallas_singlescale_encode(
                params["params"]["patchify"]["encoder"],
                events, images, enc_state,
                interpret=jax.default_backend() != "tpu",
            )
            fmap = fmap / 4.0
            imap = imap / 4.0
        else:
            fmap, imap, enc2 = vonet.apply(
                params, events, images, mask, enc_state, 1,
                method=VONet.encode
            )
        if cfg.MIXED_PRECISION and not state_bf16:
            enc2 = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.float32), enc2
            )
        return fmap, imap, enc2

    def update_fn(params, net, ctx, corr_in, ii, jj, kk, valid, lattice=None):
        if lattice is not None:
            # corr_in is in the kernel-native layout (cfg.CORR_LAYOUT)
            params = _fold_corr_fc1(
                params,
                layout="folded" if cfg.CORR_LAYOUT == "folded" else "paired",
            )
        if cfg.MIXED_PRECISION:
            # inference update runs in half precision like the reference's
            # fp16 autocast (Ramp_vo.py:23,280-284); outputs restored to f32
            params = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x,
                params,
            )
            net = net.astype(jnp.bfloat16)
            ctx = ctx.astype(jnp.bfloat16)
            corr_in = corr_in.astype(jnp.bfloat16)
        net2, (delta, weight) = vonet.apply(
            params, net, ctx, corr_in, ii, jj, kk, valid, lattice,
            # the runtime lattice keeps each row's valid cells t-contiguous
            lattice_contig=True,
            method=VONet.update_op,
        )
        return (
            net2.astype(jnp.float32),
            (delta.astype(jnp.float32), weight.astype(jnp.float32)),
        )

    def frame_post(params, state: VOState, events, images, mask,
                   intrinsics, fmap, imap):
        """Everything after the encoder (patch select -> commit -> probe
        gate -> update/keyframe). Split out so `make_vo_frames_chunk` can
        run the encoder chain scanned but the CNN heads BATCHED over the
        chunk (the heads are not recurrent given the super-states)."""
        # patch coordinate selection at 1/4 res — three-way priority
        # event_bias > GRADIENT_BIAS > random (ref: net.py:163-188; the
        # reference's gradient branch is latent — net.py never receives
        # gradient_bias=True from Ramp_vo — this implements the intended
        # config_vo GRADIENT_BIAS knob, e.g. default_rgb.yaml)
        T = events.shape[0]
        (sup,) = jnp.nonzero(mask, size=1, fill_value=T - 1)
        ev_sel = events[sup]
        if event_bias:
            coords = select_coords_event_bias(ev_sel, cfg.M, nms_rad=11)
        elif cfg.GRADIENT_BIAS:
            rng, k1 = jax.random.split(state.rng)
            state = state.replace(rng=rng)
            coords = select_coords_gradient_bias(k1, images[:1], cfg.M)
        else:
            rng, k1 = jax.random.split(state.rng)
            state = state.replace(rng=rng)
            h4, w4 = fmap.shape[1], fmap.shape[2]
            coords = select_coords_random(k1, 1, cfg.M, h4, w4)

        disps = jnp.ones((1, fmap.shape[1], fmap.shape[2]), jnp.float32)
        gmap, ictx, patches_new, clr = extract_patches(
            fmap.astype(jnp.float32), imap.astype(jnp.float32),
            images[:1], disps, coords, P=3
        )

        state = _commit(cfg, state, fmap, gmap, ictx, patches_new, clr, intrinsics)

        # motion-probe gate (pre-init only, ref: Ramp_vo.py:384-387)
        need_probe = (~state.initialized) & (state.n > 0)
        med = jax.lax.cond(
            need_probe,
            lambda st: _probe_median(cfg, update_fn, params, st),
            lambda st: jnp.float32(1e9),
            state,
        )
        skip = need_probe & (med < cfg.PROBE_THRESH)

        def do_skip(st: VOState):
            g = st.counter - 1
            ident = jnp.zeros(7, jnp.float32).at[6].set(1.0)
            s = st.slotmap[st.n]
            return st.replace(
                delta_parent=st.delta_parent.at[g].set(g - 1),
                delta_dP=st.delta_dP.at[g].set(ident),
                slot_free=st.slot_free.at[jnp.clip(s, 0, cfg.MEM - 1)].set(True),
                slotmap=st.slotmap.at[st.n].set(-1),
            )

        def do_advance(st: VOState):
            st = st.replace(n=st.n + 1)
            st = _append_edges(cfg, st)

            do_burst = (~st.initialized) & (st.n == 8)

            def burst(s):
                s = s.replace(initialized=jnp.asarray(True))
                return jax.lax.fori_loop(
                    0, 12,
                    lambda _, x: _update(cfg, update_fn, params, x, oracle), s
                )

            def normal(s):
                def run(x):
                    x = _update(cfg, update_fn, params, x, oracle)
                    return _keyframe(cfg, x)

                return jax.lax.cond(s.initialized, run, lambda x: x, s)

            return jax.lax.cond(do_burst, burst, normal, st)

        return jax.lax.cond(skip, do_skip, do_advance, state)

    def vo_frame(params, state: VOState, events, images, mask, intrinsics):
        # inputs may arrive in compact transfer dtypes (int8 stacks,
        # float16 images) — promote on device
        events = events.astype(jnp.float32)
        images = images.astype(jnp.float32)
        fmap, imap, enc2 = encode_fn(params, events, images, mask, state.enc)
        state = state.replace(enc=enc2)
        return frame_post(params, state, events, images, mask, intrinsics,
                          fmap, imap)

    vo_frame.encode_fn = encode_fn
    vo_frame.frame_post = frame_post
    if not jit_wrap:
        return vo_frame
    return jax.jit(vo_frame, donate_argnums=(1,))


def make_vo_frames_chunk(cfg: VOConfig, vonet: VONet,
                         event_bias: bool = True, oracle=None):
    """K frames per dispatch: `lax.scan` of the frame step inside ONE jit.

    TPU-native streaming amortization — the remote-dispatch floor
    (~3 ms/call on shared-TPU setups) is paid once per chunk instead of
    once per frame, at K frames of added latency. Semantics identical to
    K sequential `make_vo_frame` calls; every frame in the chunk must
    have >= 1 true mask entry (route events-only frames to
    `make_encode_only` between chunks).

    frames(params, state, events [K,T,H,W,Ce], images [K,1,H,W,3],
           masks [K,T], intrinsics [4]) -> new state.
    """
    frame = make_vo_frame(cfg, vonet, event_bias, oracle, jit_wrap=False)

    # NOTE (r04 measured dead end): running the encoder's (non-recurrent)
    # pyramid CNN heads ONCE batched over the K chunk frames — scan the
    # LSTM+fold chain, then heads at batch K — measured +0.3/+0.4 ms/frame
    # vs this plain per-frame scan (in-process A/B on fused2 AND fused3,
    # scripts/ab_chunk_variants.py): XLA already keeps the batch-1 heads
    # off the critical path, and the split scan materializes K super-state
    # pyramids. The chain/heads split survives in ops/encoder_pallas.py
    # (pallas_multiscale_chain / multiscale_heads) for probes.
    def frames(params, state, events, images, masks, intrinsics):
        def body(st, xs):
            ev, im, m = xs
            return frame(params, st, ev, im, m, intrinsics), jnp.int32(0)

        st, _ = jax.lax.scan(body, state, (events, images, masks))
        return st

    return jax.jit(frames, donate_argnums=(1,))


def make_encode_only(cfg: VOConfig, vonet: VONet):
    """Events-only frames: update encoder state, no VO (ref: Ramp_vo.py:338-342)."""

    def encode_only(params, state: VOState, events, images, mask):
        events = events.astype(jnp.float32)
        images = images.astype(jnp.float32)
        if cfg.MIXED_PRECISION:
            # same autocast treatment as the full-frame encode (the
            # reference runs events-only frames under the same context,
            # Ramp_vo.py:23,338-342); a bf16-carried state stays bf16
            params = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x,
                params,
            )
            events = events.astype(jnp.bfloat16)
            images = images.astype(jnp.bfloat16)
            state = state.replace(enc=jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16), state.enc
            ))
        if (cfg.pallas_encoder_on() and vonet.input_mode == "MultiScale"
                and events.shape[0] == 1):
            # heads are dead code here (outputs unused) — XLA DCEs them
            from ..ops.encoder_pallas import pallas_multiscale_encode

            _, _, enc2 = pallas_multiscale_encode(
                params["params"]["patchify"]["encoder"],
                events, images, mask, state.enc,
                interpret=jax.default_backend() != "tpu",
            )
        elif (cfg.pallas_encoder_on() and vonet.input_mode == "SingleScale"
                and events.shape[0] == 1):
            from ..ops.encoder_pallas import pallas_singlescale_encode

            _, _, enc2 = pallas_singlescale_encode(
                params["params"]["patchify"]["encoder"],
                events, images, state.enc,
                interpret=jax.default_backend() != "tpu",
            )
        else:
            _, _, enc2 = vonet.apply(
                params, events, images, mask, state.enc, 1,
                method=VONet.encode
            )
        return state.replace(enc=enc2)

    return jax.jit(encode_only, donate_argnums=(1,))


def make_final_updates(cfg: VOConfig, vonet: VONet, iters: int = 12,
                       oracle=None):
    """Terminal refinement: N extra updates (ref: evaluate.py:254-255)."""

    def update_fn(params, net, ctx, corr_in, ii, jj, kk, valid, lattice=None):
        if lattice is not None:
            params = _fold_corr_fc1(
                params,
                layout="folded" if cfg.CORR_LAYOUT == "folded" else "paired",
            )
        return vonet.apply(
            params, net, ctx, corr_in, ii, jj, kk, valid, lattice,
            lattice_contig=True,
            method=VONet.update_op,
        )

    def final(params, state: VOState):
        return jax.lax.fori_loop(
            0, iters,
            lambda _, s: _update(cfg, update_fn, params, s, oracle), state
        )

    return jax.jit(final, donate_argnums=(1,))


# ---------------------------------------------------------------------------
# host driver
# ---------------------------------------------------------------------------

class RampVO:
    """Host-side driver mirroring the reference's Ramp_vo class API
    (ref: Ramp_vo.py:27-129,327-410)."""

    def __init__(self, cfg: VOConfig, params, input_mode: str = "MultiScale",
                 num_event_bins: int = 5, ht: int = 480, wd: int = 640,
                 event_bias: bool = True, seed: int = 0, chunk: int = 1):
        self.cfg = cfg
        self.params = params
        self.vonet = VONet(input_mode=input_mode, evs_ch=num_event_bins, img_ch=3)
        self.ht, self.wd = ht, wd
        self.tlist: list = []
        # pose-prediction caches (ref: Ramp_vo.py:34-35)
        self._pp_tracks = None
        self._pp_models = None

        self.state = init_state(
            cfg, make_enc_state(cfg, input_mode, ht, wd), ht, wd
        )
        if seed:
            import jax as _jax

            self.state = self.state.replace(rng=_jax.random.PRNGKey(seed))

        self._vo_frame = make_vo_frame(cfg, self.vonet, event_bias)
        self._encode_only = make_encode_only(cfg, self.vonet)
        self._final_cache: dict = {}
        # chunked ingestion: buffer `chunk` frames and scan them in ONE
        # dispatch (make_vo_frames_chunk) — amortizes the remote-dispatch
        # floor; flushed by events-only frames, terminate/refinement, and
        # any state read through .flush()
        self.chunk = max(int(chunk), 1)
        self._buf: list = []
        self._vo_chunk = (
            make_vo_frames_chunk(cfg, self.vonet, event_bias)
            if self.chunk > 1 else None
        )

    def flush(self):
        """Run any buffered frames (chunked mode). Call before reading
        self.state."""
        if not self._buf:
            return
        buf, self._buf = self._buf, []
        if len(buf) == self.chunk:
            evs = jnp.stack([b[0] for b in buf])
            ims = jnp.stack([b[1] for b in buf])
            ms = jnp.stack([b[2] for b in buf])
            self.state = self._vo_chunk(
                self.params, self.state, evs, ims, ms,
                jnp.asarray(buf[0][3], jnp.float32),
            )
        else:  # partial chunk: per-frame path
            for ev, im, m, K in buf:
                self.state = self._vo_frame(
                    self.params, self.state, ev, im, m,
                    jnp.asarray(K, jnp.float32),
                )

    def __call__(self, tstamp, events, image, mask, intrinsics):
        """events [T, H, W, C], image [1, H, W, 3] normalized, mask [T]
        host-side bool array, intrinsics [4]."""
        mask = np.asarray(mask).reshape(-1).astype(bool)
        if not mask.any():
            self.flush()
            self.state = self._encode_only(
                self.params, self.state, events, image, jnp.asarray(mask)
            )
            return
        self.tlist.append(tstamp)
        if self.chunk > 1:
            self._buf.append((events, image, jnp.asarray(mask), intrinsics))
            if len(self._buf) == self.chunk:
                self.flush()
            return
        self.state = self._vo_frame(
            self.params, self.state, events, image, jnp.asarray(mask),
            jnp.asarray(intrinsics, jnp.float32),
        )

    def predict_future_pose(self, sec_to_pred_future, abs_time,
                            last_keyframe_number, deg=4, frequency=30.0):
        """Spline-based future-pose extrapolation (ref: Ramp_vo.py:446-514)."""
        self.flush()
        from .pose_prediction import predict_future_pose

        return predict_future_pose(
            self, sec_to_pred_future, abs_time, last_keyframe_number,
            deg=deg, frequency=frequency,
        )

    def final_refinement(self, iters: int = 12):
        """N terminal update iterations (ref: evaluate.py:254-255). Each
        distinct `iters` compiles once and is cached."""
        self.flush()
        if iters <= 0:
            return
        if iters not in self._final_cache:
            self._final_cache[iters] = make_final_updates(
                self.cfg, self.vonet, iters=iters
            )
        self.state = self._final_cache[iters](self.params, self.state)

    def point_cloud(self):
        """World-space patch-center point cloud + colors for export
        (ref: Ramp_vo.py:308-310, evaluate.py:256-258). [m, 3] each."""
        self.flush()
        import jax.numpy as jnp

        st = self.state
        cfg = self.cfg
        g = jnp.arange(int(st.counter))
        poses = st.poses[g]  # world-to-camera per global frame
        centers = jnp.stack(
            [st.pat_cx[g], st.pat_cy[g], st.pat_d[g]], axis=-1
        )  # [n, M, 3] (x, y, invdepth)

        fx, fy, cx, cy = st.intrinsics
        X0 = jnp.stack(
            [
                (centers[..., 0] - cx) / fx,
                (centers[..., 1] - cy) / fy,
                jnp.ones_like(centers[..., 2]),
                centers[..., 2],
            ],
            axis=-1,
        )
        Ginv = lops.se3_inv(poses)
        X1 = lops.se3_act4(Ginv[:, None, :], X0)
        pts = X1[..., :3] / jnp.maximum(X1[..., 3:], 1e-8)
        colors = np.asarray(st.colors[: int(st.counter)]).reshape(-1, 3)
        return np.asarray(pts).reshape(-1, 3), colors

    def terminate(self):
        """Interpolate removed/skipped frames through the delta chain and
        return (poses [N,7] camera-to-world, tstamps [N])
        (ref: Ramp_vo.py:162-173)."""
        self.flush()
        st = self.state
        n = int(st.n)
        counter = int(st.counter)
        l2g = np.asarray(st.l2g[:n])
        poses = np.asarray(st.poses)
        parent = np.asarray(st.delta_parent)
        dP = np.asarray(st.delta_dP)

        traj = {int(g): poses[int(g)] for g in l2g if g >= 0}

        def get_pose(t):
            if t in traj:
                return traj[t]
            t0 = int(parent[t])
            p = lops.se3_mul(
                jnp.asarray(dP[t])[None], jnp.asarray(get_pose(t0))[None]
            )
            traj[t] = np.asarray(p[0])
            return traj[t]

        out = np.stack([get_pose(t) for t in range(counter)])
        out = np.asarray(lops.se3_inv(jnp.asarray(out)))
        return out, np.array(self.tlist, dtype=float)
