"""VOState: the entire SLAM state as one fixed-shape pytree.

Replaces Ramp_vo's mutable attributes (ref: ramp/Ramp_vo.py:53-100) with a
functional design built for XLA:

  * frame-GLOBAL buffers (poses, patches, colors, trajectory deltas) are
    indexed by an immutable global frame id and never move. Keyframe
    eviction — which in the reference physically shifts pose/patch/feature
    buffers (Ramp_vo.py:258-268) — here only edits two small int32 maps.
  * `l2g` maps logical keyframe index -> global id (the reference's
    implicit row identity); `slotmap` maps logical index -> feature-ring
    slot, with a free-list (`slot_free`) replacing the reference's
    `n % mem` ring + shift.
  * the dynamic edge lists ii/jj/kk/net (Ramp_vo.py:92-94,200) become a
    fixed-shape EDGE LATTICE [NI hosts, T offsets, M patches]: an edge is
    (host frame i, target j = i + t - (r-1), patch m), stored at row
    i mod NI. ii/jj/kk are pure index arithmetic (edge_table), appends are
    static cell writes, and grouping by target — what the correlation
    kernel needs — is an affine block mapping instead of a 60k argsort +
    scatter + unsort-gather per update. Only `cell_valid` [NI, T] and the
    per-edge recurrent state are stored.
  * trajectory interpolation deltas (Ramp_vo.py:100,155-160) are stored in
    device arrays (parent id + relative SE3), so the hot loop never syncs
    with the host; `terminate()` reads them back once.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.corr_pallas import RING_PAD, ring_padded_shape, strips_shape
from .config import VOConfig


@struct.dataclass
class VOState:
    # ---- frame-global buffers (row = global frame id) ----
    poses: jnp.ndarray        # [F, 7] world-to-camera SE3
    # patches are stored PLANAR (structure-of-arrays): the interleaved
    # [F*M, 3, P, P] form has minor dims (3, 3) that XLA tiles to (8, 128)
    # — a ~170x physical padding paid by every gather/scatter (measured as
    # the bulk of the r03 5 ms in-frame reproject cost). x/y are immutable
    # per frame after commit; inverse depth is per-PATCH (constant over the
    # patch in both this runtime and the reference) and lives in pat_d;
    # centers are cached in pat_cx/pat_cy so BA/keyframe/point-cloud never
    # do stride-PP lane extractions. The `patches` property reconstructs
    # the interleaved view for host-side/legacy consumers.
    pat_x: jnp.ndarray        # [F, M*P*P] pixel x at 1/4 res
    pat_y: jnp.ndarray        # [F, M*P*P]
    pat_d: jnp.ndarray        # [F, M] inverse depth (per patch)
    pat_cx: jnp.ndarray       # [F, M] center-pixel x
    pat_cy: jnp.ndarray       # [F, M] center-pixel y
    colors: jnp.ndarray       # [F, M, 3]
    delta_parent: jnp.ndarray  # [F] int32, -1 = none
    delta_dP: jnp.ndarray     # [F, 7] relative SE3 for removed/skipped frames

    # ---- logical maps ----
    l2g: jnp.ndarray          # [L] int32 logical keyframe -> global id (-1)
    slotmap: jnp.ndarray      # [L] int32 logical keyframe -> ring slot (-1)
    slot_free: jnp.ndarray    # [MEM] bool

    # ---- feature rings (row = ring slot) ----
    # fmap rings are stored PRE-PADDED for the correlation kernels' clamped
    # tile slices (ops/corr_pallas.ring_padded_shape): commit writes one
    # slot's interior instead of every update re-padding all MEM slots.
    imap_r: jnp.ndarray       # [MEM, M, DIM]
    gmap_r: jnp.ndarray       # [MEM, M, P, P, 128]
    fmap1_r: jnp.ndarray      # [MEM, *ring_padded_shape(h, w), 128]
    fmap2_r: jnp.ndarray      # [MEM, *ring_padded_shape(h//4, w//4), 128]

    # ---- edge lattice [NI, T, M] (see module docstring) ----
    cell_valid: jnp.ndarray   # [NI, T] bool
    net: jnp.ndarray          # [NI, T, M, DIM] hidden state
    last_weight: jnp.ndarray  # [NI, T, M, 2]

    # ---- encoder recurrent state ----
    enc: Any

    # ---- scalars ----
    n: jnp.ndarray            # int32 number of logical keyframes
    counter: jnp.ndarray      # int32 next global frame id (VO frames only)
    initialized: jnp.ndarray  # bool
    intrinsics: jnp.ndarray   # [4] fx fy cx cy at 1/RES
    rng: jnp.ndarray          # PRNG key

    # ---- optional strip-major views of the fmap rings ----
    # (ops/corr_pallas.make_strips), allocated only for CORR_LAYOUT
    # "fused3"/"fused4": the kernel's per-edge tile becomes one contiguous 2-D
    # sublane slice (no Mosaic relayout). Rebuilt per commit for the new
    # slot only; indexed by the same slotmap.
    strips1_r: Any = None     # [MEM, NX1, Hp1*TX, 128] or None
    strips2_r: Any = None     # [MEM, NX2, Hp2*TX, 128] or None

    # ---- static aux (not a pytree leaf) ----
    hw4: tuple = struct.field(pytree_node=False, default=None)
    # interior (h, w) of the padded fmap rings (= input resolution / 4)

    @property
    def patches(self) -> jnp.ndarray:
        """Interleaved [F*M, 3, P, P] view of the planar patch buffers
        (host-side/legacy consumers only — reconstructing this on the hot
        path would reintroduce the (3, 3)-minor-dim layout tax)."""
        F, M = self.pat_d.shape
        PP = self.pat_x.shape[1] // M
        P = int(round(PP ** 0.5))
        px = self.pat_x.reshape(F * M, P, P)
        py = self.pat_y.reshape(F * M, P, P)
        pd = jnp.broadcast_to(
            self.pat_d.reshape(F * M)[:, None, None], (F * M, P, P)
        )
        return jnp.stack([px, py, pd], axis=1)


def host_of_row(i_row, n, NI: int):
    """Logical host frame held by lattice row i_row when n keyframes are
    live: the unique i in (n-1-NI, n-1] with i === i_row (mod NI).
    May be negative (row unoccupied) early in the sequence."""
    return n - 1 - jnp.mod(n - 1 - i_row, NI)


def edge_table(cfg: VOConfig, n, cell_valid):
    """Derive the flat (ii, jj, kk, valid) edge view of the lattice.

    Replaces the reference's stored ii/jj/kk lists (Ramp_vo.py:92-94) with
    pure index arithmetic over the [NI, T, M] lattice; row-major flat order.
    """
    NI, T, M = cfg.NI, cfg.T, cfg.M
    r = cfg.PATCH_LIFETIME
    i_row = jnp.arange(NI, dtype=jnp.int32)[:, None, None]
    t = jnp.arange(T, dtype=jnp.int32)[None, :, None]
    m = jnp.arange(M, dtype=jnp.int32)[None, None, :]
    ii = jnp.broadcast_to(host_of_row(i_row, n, NI) + 0 * t + 0 * m,
                          (NI, T, M))
    jj = ii + (t - (r - 1))
    kk = ii * M + m
    valid = (
        cell_valid[:, :, None]
        & (ii >= 0) & (jj >= 0) & (ii <= n - 1) & (jj <= n - 1)
    )
    E = NI * T * M
    valid = jnp.broadcast_to(valid, (NI, T, M))
    # sanitize invalid rows: derived indices can be far out of range and
    # jnp.take's default fill mode would turn them into NaN poses inside
    # consumers (weight-gating does not stop 0 * NaN)
    ii = jnp.where(valid, ii, 0)
    jj = jnp.where(valid, jj, 0)
    kk = jnp.where(valid, kk, 0)
    return ii.reshape(E), jj.reshape(E), kk.reshape(E), valid.reshape(E)


def init_state(cfg: VOConfig, enc_state, ht: int, wd: int, P: int = 3,
               dim: int = 384) -> VOState:
    """ht, wd: full input resolution; feature maps live at 1/4."""
    F, L, M = cfg.MAX_FRAMES, cfg.BUFFER_SIZE, cfg.M
    NI, T = cfg.NI, cfg.T
    MEM = cfg.MEM
    h, w = ht // 4, wd // 4
    fdt = jnp.bfloat16 if cfg.MIXED_PRECISION else jnp.float32

    poses = jnp.zeros((F, 7), jnp.float32).at[:, 6].set(1.0)
    return VOState(
        poses=poses,
        pat_x=jnp.zeros((F, M * P * P), jnp.float32),
        pat_y=jnp.zeros((F, M * P * P), jnp.float32),
        pat_d=jnp.zeros((F, M), jnp.float32),
        pat_cx=jnp.zeros((F, M), jnp.float32),
        pat_cy=jnp.zeros((F, M), jnp.float32),
        colors=jnp.zeros((F, M, 3), jnp.float32),
        delta_parent=jnp.full((F,), -1, jnp.int32),
        delta_dP=jnp.zeros((F, 7), jnp.float32).at[:, 6].set(1.0),
        l2g=jnp.full((L,), -1, jnp.int32),
        slotmap=jnp.full((L,), -1, jnp.int32),
        slot_free=jnp.ones((MEM,), bool),
        imap_r=jnp.zeros((MEM, M, dim), fdt),
        gmap_r=jnp.zeros((MEM, M, P, P, 128), fdt),
        fmap1_r=jnp.zeros((MEM,) + ring_padded_shape(h, w) + (128,), fdt),
        fmap2_r=jnp.zeros(
            (MEM,) + ring_padded_shape(h // 4, w // 4) + (128,), fdt
        ),
        strips1_r=(
            jnp.zeros((MEM,) + strips_shape(h, w) + (128,), fdt)
            if cfg.CORR_LAYOUT in ("fused3", "fused4") else None
        ),
        strips2_r=(
            jnp.zeros((MEM,) + strips_shape(h // 4, w // 4) + (128,), fdt)
            if cfg.CORR_LAYOUT in ("fused3", "fused4") else None
        ),
        cell_valid=jnp.zeros((NI, T), bool),
        net=jnp.zeros((NI, T, M, dim), jnp.float32),
        last_weight=jnp.zeros((NI, T, M, 2), jnp.float32),
        enc=enc_state,
        n=jnp.int32(0),
        counter=jnp.int32(0),
        initialized=jnp.asarray(False),
        intrinsics=jnp.zeros((4,), jnp.float32),
        rng=jax.random.PRNGKey(0),
        hw4=(h, w),
    )
