"""Pallas TPU correlation kernels for the edge lattice.

The XLA formulations of `ops.corr` are bounded by the TPU's scattered-gather
rate (~50-80 GB/s measured): every (edge, patch-pixel) window re-reads HBM.
These kernels remove HBM gathers entirely: one grid step = one lattice cell
(M same-host/same-target edges); the target slot's zero-padded feature map
is DMA'd into a VMEM scratch once per slot change; per edge, ONE
[TY, TX, C] bounding tile around the patch center is sliced from VMEM and
correlated with all P^2 patch-pixel features on the MXU; window alignment,
8x8 compaction, and the bilinear blend run in-kernel.

Exploits the lattice structure: patch inverse depth is constant across a
patch (ramp/utils.py:99-101), so its 9 reprojected pixels stay within a few
px of the center. A pixel farther than `SPREAD` px gets a zeroed window
(treated as out-of-bounds - geometry the BA robust gates discard anyway,
ba_cuda.cu:296-308). Otherwise semantics match
altcorr/correlation_kernel.cu:83-136,221-232 exactly.

Kept implementations (dead-end variants measured and removed r04; see
STATUS.md for the graveyard record):
  * `corr_lattice_fused2` — the production TPU kernel (CORR_LAYOUT
    "fused2"); hardware-verified (scripts/check_layouts_onchip.py).
  * `corr_lattice2` / `corr_lattice2_stacked` — band-output kernel + XLA
    finish; the interpret-friendly CPU reference (CORR_LAYOUT "stacked" /
    "folded"; the folded form feeds the corr-MLP weight-fold path). The
    folded/stacked dynamic-amount rolls MISCOMPILE on real TPUs — CPU and
    parity-test use only.
  * `corr_train_fused` (+ `corr_sched_fused`/`corr_sched_bwd`) — the
    training path: static sorted edge schedule, custom VJP.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

E_BLK = 64
GANG = 8            # edges per fused MXU matmul in the 2-level kernel
SPREAD = 4            # max |patch pixel - center| handled exactly (px)
TY = 16               # tile rows: D + 2*SPREAD
TX = 24               # tile cols: >= D + 2*SPREAD + 7 (8-align slack)
BAND = 16             # aligned x-band written per window
# level-2 tile (fused2 only). Coords are 4x compressed, so SPREAD2=1
# (TY2=10) would preserve exactness and shrink the per-edge dot — but it is
# a MEASURED LOSER: 10 rows isn't 8-sublane-aligned, and the tile
# slice/reshape relayout costs more than the smaller dot + one fewer roll
# bit save (-2.19 ms at bench shapes, scripts/ab_ty2.py, exact in-spread
# parity). Kept parameterized (spread=/tyl= kwargs + _nbits) so the A/B is
# one monkeypatch; the shipped tile stays the aligned 16x24.
SPREAD2 = 4
TY2 = 16              # D + 2*SPREAD2 (8-sublane-aligned; see above)


def _nbits(tyl, D=8):
    """Roll bits for the fused kernel's binary alignment: enough to cover
    the max packed offset (tyl-D)*TX + (TX-D)."""
    return int(np.ceil(np.log2((tyl - D) * TX + (TX - D) + 1)))


def _s4_consts(D=8):
    """Blend-folded window extraction matrix [D*TX, 256].

    c4 = r_aligned[:, :D*TX] @ S4 yields the four bilinear corner
    extractions [c00 | c01 | c10 | c11] (lane shifts 0/1/8/9 of the 8x8
    compaction) in one MXU pass — replacing the three [*, 64] lane rolls
    of the blend (measured 3.4 ms/call at bench shapes, the second-largest
    kernel phase) with 2 extra MXU column tiles. The `good` window mask
    (dx < D-1, dy < D-1) is pre-folded: dead columns are zero, so shifted
    indices never wrap."""
    S4 = np.zeros((D * TX, 256), np.float32)
    for a, s in enumerate((0, 1, 8, 9)):
        for k in range(64):
            if (k // 8 < D - 1) and (k % 8 < D - 1):
                m = k + s
                S4[(m // 8) * TX + (m % 8), a * 64 + k] = 1.0
    return S4


def _kernel_lat(tabs, fmap1_hbm, fmap2_hbm, g_ref, scal_ref,
                out1_ref, out2_ref, scratch1, scratch2, tile_scratch,
                dmt_scratch, last_slot, sem1, sem2, *, C, PP, D, M, NI):
    """Edge-lattice variant of _kernel2: one grid step = one lattice cell
    (96 edges sharing host i and target j). The edge lattice makes the
    sort/scatter/unsort machinery of per-edge kernels unnecessary — blocks of
    same-slot edges exist BY CONSTRUCTION, the patch features arrive as a
    contiguous gmap ring row via the BlockSpec (no XLA gather), and invalid
    cells are skipped entirely (predicated grid steps).

    tabs [NB, 5]: (in_row, t, slot_j, gslot, out_row); out_row == NI marks
    an invalid cell (routed to the trash row by the out index_map)."""
    b = pl.program_id(0)
    valid = tabs[b, 4] < NI
    slot = tabs[b, 2]

    @pl.when(b == 0)
    def _init():
        last_slot[0] = -1

    @pl.when(valid & (slot != last_slot[0]))
    def _load():
        cp1 = pltpu.make_async_copy(fmap1_hbm.at[slot], scratch1, sem1)
        cp2 = pltpu.make_async_copy(fmap2_hbm.at[slot], scratch2, sem2)
        cp1.start()
        cp2.start()
        cp1.wait()
        cp2.wait()
        last_slot[0] = slot

    @pl.when(valid)
    def _compute():
        def edge_gang(i, carry):
            for u in range(GANG):
                e = i * GANG + u
                for lvl, scratch in ((0, scratch1), (1, scratch2)):
                    tile = scratch[
                        pl.ds(scal_ref[0, 0, e, 2 * lvl], TY),
                        pl.ds(
                            pl.multiple_of(scal_ref[0, 0, e, 2 * lvl + 1], 8),
                            TX,
                        ),
                        :,
                    ]
                    row = (u * 2 + lvl) * TY * TX
                    tile_scratch[pl.ds(row, TY * TX), :] = tile.reshape(
                        TY * TX, C
                    )

            # gang patch features: contiguous rows of the gmap block
            g_gang = g_ref[0, pl.ds(i * GANG * PP, GANG * PP), :]
            dmt = jax.lax.dot_general(
                g_gang, tile_scratch[...],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [GANG*PP, GANG*2*TY*TX]
            dmt_scratch[...] = dmt

            for u in range(GANG):
                e = i * GANG + u
                for lvl, out_ref in ((0, out1_ref), (1, out2_ref)):
                    base = (u * 2 + lvl) * TY * TX
                    for q in range(PP):
                        row = dmt_scratch[
                            pl.ds(u * PP + q, 1), pl.ds(base, TY * TX)
                        ]
                        # packed offset oy*TX+ox: rolls the window so its
                        # D x D block sits at cols [0, D) of each tile row
                        # (no wrap: ox + D <= TX) - the x-selection one-hot
                        # einsum outside the kernel disappears entirely
                        off = scal_ref[0, 0, e, 4 + lvl * PP + q]
                        win = pltpu.roll(row, -off, 1)[:, : D * TX]
                        out_ref[0, 0, e, q] = win.astype(out_ref.dtype)
            return carry

        jax.lax.fori_loop(0, M // GANG, edge_gang, 0)


def _kernel_lat_fused2(tabs, fmap1_hbm, fmap2_hbm, g_ref, scal_ref, vcol_ref,
                       consts_ref, out_ref, scratch1, scratch2, rs0, rs1,
                       last_slot, sem1, sem2, *, C, PP, D, M, NI, ablate=(),
                       pin_inputs=False):
    """The production lattice correlation kernel (no staging round-trips).

    The fused kernel's cost is NOT the MXU work (~0.5 ms of dots at bench
    shapes) — it is the per-gang VMEM traffic: 16 tile copies into
    tile_scratch (store+reload), the dmt store+reload, the 16 diagonal-block
    extractions into rs, and 144 (1,1)-element scalar-column stores. This
    variant:

      * dots each edge-level's gmap rows [PP, C] DIRECTLY against its tile
        slice [TY*TX, C] (16 small MXU matmuls per gang) — the tile is read
        once and never stored; dmt_scratch and tile_scratch disappear;
      * the roll scratches become 3-D [GANG, PP, TY*TX] so every store is
        STATIC-indexed (python-unrolled u) instead of a dynamic 9-row
        sublane slice;
      * the packed per-window scalars arrive as a PIPELINED VMEM input
        column [M*PP, 2] (one 7 kB DMA per cell) instead of 144 tiny
        SMEM->VMEM stores per gang.

    Output contract: paired 128-lane blended windows per edge.
    Ref semantics: altcorr/correlation_kernel.cu:83-136,221-232.

    `ablate` (static, TIMING ONLY — output is garbage): drop kernel phases
    to attribute on-chip cost. "dots" zeroes rs instead of the MXU dots
    (also removes the tile VMEM reads), "rolls" skips the binary alignment
    rolls, "smat" replaces the S extraction matmul with a slice, "blend"
    skips the bilinear lane rolls."""
    b = pl.program_id(0)
    valid = tabs[b, 4] < NI
    slot = tabs[b, 2]

    @pl.when(b == 0)
    def _init():
        last_slot[0] = -1

    @pl.when(valid & (slot != last_slot[0]))
    def _load():
        cp1 = pltpu.make_async_copy(fmap1_hbm.at[slot], scratch1, sem1)
        cp2 = pltpu.make_async_copy(fmap2_hbm.at[slot], scratch2, sem2)
        cp1.start()
        cp2.start()
        cp1.wait()
        cp2.wait()
        last_slot[0] = slot

    @pl.when(valid)
    def _compute():
        # S4 (blend-folded extraction) is a COMPILE-TIME constant built in
        # the wrapper (numpy) and passed as one pinned VMEM input: pallas
        # kernel jaxprs are lowered WITHOUT dead-code elimination and TPUs
        # have no integer divide — building these in-kernel via
        # broadcasted_iota + //24 / %24 ran per grid step and measured
        # ~11 ms/call at bench shapes (61% of the kernel was this "fixed"
        # cost; see scripts/ab_fused2_phases.py)
        S4 = consts_ref[...]                          # [D*TX, 256] f32

        def edge_gang(i, carry):
            # one aligned [GANG*PP, C] load; per-edge rows sliced STATICALLY
            # (dynamic 9-row loads are not 8-aligned and fail Mosaic layout)
            gi = tabs[b, 3] if pin_inputs else 0
            g_gang = g_ref[gi, pl.ds(i * GANG * PP, GANG * PP), :]
            for u in range(GANG):
                e = i * GANG + u
                g_u = g_gang[u * PP:(u + 1) * PP, :]        # [PP, C]
                for lvl, rs, scratch, tyl in (
                    (0, rs0, scratch1, TY), (1, rs1, scratch2, TY2)
                ):
                    if "dots" in ablate:
                        if "nors" in ablate:
                            continue
                        rs[u] = jnp.zeros((PP, tyl * TX), rs.dtype)
                        continue
                    tile = scratch[
                        pl.ds(scal_ref[0, 0, e, 2 * lvl], tyl),
                        pl.ds(
                            pl.multiple_of(
                                scal_ref[0, 0, e, 2 * lvl + 1], 8
                            ),
                            TX,
                        ),
                        :,
                    ]
                    dm = jax.lax.dot_general(
                        g_u, tile.reshape(tyl * TX, C),
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).astype(rs.dtype)
                    rs[u] = dm

            outs = []
            for lvl, rs, tyl, nbits in (
                (0, rs0, TY, _nbits(TY)), (1, rs1, TY2, _nbits(TY2))
            ):
                if "nors" in ablate:  # timing: isolate the rs scratch
                    # round-trip (write+readback+reshape) within "fixed"
                    r_ = jnp.zeros((GANG * PP, tyl * TX), jnp.float32)
                else:
                    r_ = rs[...].reshape(GANG * PP, tyl * TX)
                if "novcol" in ablate:  # timing: kill the minor-dim-2
                    # per-step vcol DMA (suspect: 864 strided descriptors
                    # into a 128-lane-padded window)
                    v_ = jnp.full((GANG * PP, 1), (1 << 28) | 37, jnp.int32)
                else:
                    v_ = vcol_ref[
                        0, 0, pl.ds(i * GANG * PP, GANG * PP), pl.ds(lvl, 1)
                    ]                              # [GANG*PP, 1]
                off = v_ & 255
                if "rolls" not in ablate:
                    for bit in range(nbits):
                        rolled = pltpu.roll(r_, tyl * TX - (1 << bit), 1)
                        r_ = jnp.where(((off >> bit) & 1) == 1, rolled, r_)
                if "smat" in ablate:
                    c4 = jnp.concatenate([r_[:, :64]] * 4, axis=1)
                else:
                    c4 = jax.lax.dot_general(
                        r_[:, : D * TX], S4,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # [GANG*PP, 256] = [c00 | c01 | c10 | c11]
                fx = ((v_ >> 8) & 1023).astype(jnp.float32) * (1.0 / 1024.0)
                fy = ((v_ >> 18) & 1023).astype(jnp.float32) * (1.0 / 1024.0)
                okm = ((v_ >> 28) & 1).astype(jnp.float32)
                if "blend" in ablate:
                    out_l = okm * c4[:, :64]
                else:
                    out_l = okm * (
                        (1 - fy) * (1 - fx) * c4[:, 0:64]
                        + (1 - fy) * fx * c4[:, 64:128]
                        + fy * (1 - fx) * c4[:, 128:192]
                        + fy * fx * c4[:, 192:256]
                    )
                outs.append(out_l)

            pair = jnp.concatenate(outs, axis=1)  # [GANG*PP, 128]
            if "nostore" in ablate:  # timing: VREG->VMEM store + relayout
                rs0[:, :, :128] = pair.reshape(GANG, PP, 128)
            else:
                out_ref[0, 0, pl.ds(i * GANG, GANG)] = pair.astype(
                    out_ref.dtype
                ).reshape(GANG, PP, 128)
            return carry

        if "noloop" in ablate:  # timing: grid + slot copies only
            pass
        elif "unroll" in ablate:  # timing: fori_loop bookkeeping probe
            for _i in range(M // GANG):
                edge_gang(_i, 0)
        else:
            jax.lax.fori_loop(0, M // GANG, edge_gang, 0)


RING_PAD = 24  # = 3*D for D=8 (radius-3 windows)


def ring_padded_shape(h: int, w: int, pad: int = RING_PAD) -> tuple:
    hr = (-(h + 2 * pad)) % 8
    wr = (-(w + 2 * pad + 16)) % 8
    return h + 2 * pad + hr, w + 2 * pad + 16 + wr


def _pad_ring(fm, pad):
    """Zero-pad a feature ring for the kernels' clamped tile slices.
    DMA slice extents must be 8-aligned on the sublane dim."""
    H, W = fm.shape[1], fm.shape[2]
    hr = (-(H + 2 * pad)) % 8
    wr = (-(W + 2 * pad + 16)) % 8
    return jnp.pad(fm, ((0, 0), (pad, pad + hr), (pad, pad + 16 + wr), (0, 0)))


def _level_prep(c, H, W, P, R, D, pad, spread=SPREAD, tyl=TY):
    x = c[..., 0]
    y = c[..., 1]
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    sy = jnp.clip(y0, -D, H + D) - R + pad
    sx = jnp.clip(x0, -D, W + D) - R + pad
    ty = sy[:, P // 2, P // 2] - spread
    tx = ((sx[:, P // 2, P // 2] - spread) // 8) * 8
    oy = sy - ty[:, None, None]
    ox = sx - tx[:, None, None]
    ok = (oy >= 0) & (oy <= tyl - D) & (ox >= 0) & (ox <= TX - D)
    oy = jnp.clip(oy, 0, tyl - D)
    ox = jnp.clip(ox, 0, TX - D)
    return x, y, x0, y0, ty, tx, oy, ox, ok


def _finish_aligned(band, prep, E, P, R, D, vmask=None):
    """Bilinear blend + reference window-order transpose for kernels whose
    windows are already (oy, ox)-aligned at the tile origin.

    `vmask` [E]: edges whose output block the kernel never wrote
    (invalid/uncovered lattice cells). Those rows are UNINITIALIZED memory —
    they must be killed with `where` (0 * garbage can be NaN/Inf)."""
    x, y, x0, y0, _, _, _, _, ok = prep
    m = ok.reshape(E, P, P)[..., None, None]
    if vmask is not None:
        m = m & vmask.reshape(E, 1, 1, 1, 1)
    vol = band[..., :D].astype(jnp.float32).reshape(E, P, P, D, D)
    vol = jnp.where(m, vol, 0.0)
    fx = (x - x0.astype(jnp.float32))[..., None, None]
    fy = (y - y0.astype(jnp.float32))[..., None, None]
    d = 2 * R + 1
    out = (
        (1 - fy) * (1 - fx) * vol[..., :d, :d]
        + (1 - fy) * fx * vol[..., :d, 1:]
        + fy * (1 - fx) * vol[..., 1:, :d]
        + fy * fx * vol[..., 1:, 1:]
    )
    out = jnp.swapaxes(out[..., None], -2, -3)[..., 0]
    return out.reshape(E, P, P, d * d)


@functools.lru_cache(maxsize=16)
def _compact_cells(NI, T, r):
    """Static compact (target a, offset t) enumeration for the lattice
    grid. A cell is live only if its host i = j - t + (r-1) lies within
    the last NI frames (i <= n-1 and i > n-1-NI, the row-occupancy
    invariant) — in (a, t) space that is the n-INDEPENDENT band
    a - NI + 2 <= t <= a + r - 1 - (NTGT - NI), so the full NTGT*T
    rectangle wastes ~40% of its grid steps on never-valid cells. All
    other validity (early-sequence j bounds, cell_valid) stays dynamic via
    the tabs `valid` predicate."""
    NTGT = NI + r - 2
    a_np, t_np = [], []
    for a in range(NTGT):
        for t in range(T):
            i_rel = a - t + r - 1          # i - (n - NTGT)
            if NTGT - NI <= i_rel <= NTGT - 1:
                a_np.append(a)
                t_np.append(t)
    return np.asarray(a_np, np.int32), np.asarray(t_np, np.int32)


def _cell_tables(NI, T, M, r, n, cell_valid, slotmap, MEM, L):
    """Per-grid-step tables for the lattice kernels (tiny; replaces the
    per-update 60k sort a flat edge table would need). tabs [NB, 5]: (in_row, t, slot_j,
    gslot, out_row); out_row == NI marks an invalid cell (routed to the
    trash row by the out index_map)."""
    NTGT = NI + r - 2          # targets with any possibly-live cell

    a_np, t_np = _compact_cells(NI, T, r)
    NB = len(a_np)
    a = jnp.asarray(a_np)
    t = jnp.asarray(t_np)
    bidx = jnp.arange(NB, dtype=jnp.int32)
    j = n - NTGT + a
    i = j - t + (r - 1)
    row = jnp.mod(i, NI)
    # the row must actually hold host i under the current numbering
    occupied = (n - 1 - jnp.mod(n - 1 - row, NI)) == i
    cv = cell_valid[jnp.clip(row, 0, NI - 1), jnp.clip(t, 0, T - 1)]
    valid = cv & occupied & (i >= 0) & (j >= 0) & (j <= n - 1)
    slot_j = jnp.clip(slotmap[jnp.clip(j, 0, L - 1)], 0, MEM - 1)
    gslot = jnp.clip(slotmap[jnp.clip(i, 0, L - 1)], 0, MEM - 1)
    # invalid blocks: pin EVERY block index to a constant so consecutive
    # invalid grid steps revisit identical blocks — Pallas skips the
    # copy-in/copy-out entirely. With varying indices each invalid block
    # paid ~3 DMA issue latencies (~20 us/block — the kernel's former
    # fixed cost was dominated by this, not by compute).
    in_row = jnp.where(valid, row, 0)
    out_row = jnp.where(valid, row, NI)
    t_io = jnp.where(valid, t, 0)
    # slot_j: FORWARD-FILL invalid steps from the last valid step instead
    # of pinning to 0, so a pipelined whole-slot input block (fused3) sees
    # contiguous index runs — a 0-pin would break runs at every invalid
    # step and re-issue the (large) slot DMA (manual loaders are
    # unaffected: they only load on `valid & changed`).
    vidx = jnp.where(valid, bidx, -1)
    fidx = jax.lax.cummax(vidx)
    first = jnp.argmax(valid)
    fill = jnp.clip(jnp.maximum(fidx, first), 0, NB - 1)
    slot_j = jnp.where(valid, slot_j, slot_j[fill])
    gslot = jnp.where(valid, gslot, 0)
    tabs = jnp.stack(
        [in_row, t_io, slot_j, gslot, out_row], axis=1
    ).astype(jnp.int32)
    return tabs, NB


def _cell_vmask(NI, T, M, r, n, cell_valid):
    """Per-edge validity: cells the lattice grid actually computed (mirrors
    the tabs `valid`, re-expressed per (row, t) cell). Rows of cells outside
    this mask are UNINITIALIZED kernel output memory and must be killed with
    `where` (0 * garbage can be NaN/Inf)."""
    NTGT = NI + r - 2
    i_row = jnp.arange(NI, dtype=jnp.int32)[:, None]
    tt = jnp.arange(T, dtype=jnp.int32)[None, :]
    i_host = n - 1 - jnp.mod(n - 1 - i_row, NI) + 0 * tt
    j_tgt = i_host + tt - (r - 1)
    cv = (
        cell_valid & (i_host >= 0) & (j_tgt >= 0) & (j_tgt <= n - 1)
        & (j_tgt >= n - NTGT)
    )
    return jnp.broadcast_to(cv[:, :, None], (NI, T, M)).reshape(NI * T * M)


def _lattice_bands(
    gmap_r, fmap1, fmap2, coords, cell_valid, n, slotmap,
    r, radius, interpret, prepadded, hw,
):
    """Shared core of the lattice kernels: tables + geometry + pallas call.
    Returns (band1, band2, prep1, prep2, vmask, (E, P, R, D))."""
    NI, T, M, P, _, _ = coords.shape
    if prepadded:
        MEM, C = fmap1.shape[0], fmap1.shape[3]
        H1, W1, H2, W2 = hw
    else:
        MEM, H1, W1, C = fmap1.shape
        _, H2, W2, _ = fmap2.shape
    L = slotmap.shape[0]
    R = radius
    D = 2 * R + 2
    PP = P * P
    pad = 3 * D
    E = NI * T * M
    assert M % GANG == 0, "lattice kernel needs M % 8 == 0"

    tabs, NB = _cell_tables(NI, T, M, r, n, cell_valid, slotmap, MEM, L)

    # ---- per-edge window geometry, in lattice order ----
    cflat = coords.reshape(E, P, P, 2)
    prep1 = _level_prep(cflat, H1, W1, P, R, D, pad)
    prep2 = _level_prep(cflat / 4.0, H2, W2, P, R, D, pad)

    def level_cols(prep):
        _, _, _, _, ty, tx, oy, ox, _ = prep
        return ty, tx, (oy * TX + ox).reshape(E, PP)

    ty1, tx1, off1 = level_cols(prep1)
    ty2, tx2, off2 = level_cols(prep2)
    scal = jnp.concatenate(
        [ty1[:, None], tx1[:, None], ty2[:, None], tx2[:, None], off1, off2],
        axis=1,
    ).astype(jnp.int32).reshape(NI, T, M, 4 + 2 * PP)

    if prepadded:
        fpad1, fpad2 = fmap1, fmap2
    else:
        fpad1 = _pad_ring(fmap1, pad)
        fpad2 = _pad_ring(fmap2, pad)
    Hp1, Wp1 = fpad1.shape[1], fpad1.shape[2]
    Hp2, Wp2 = fpad2.shape[1], fpad2.shape[2]

    gflat = gmap_r.reshape(MEM, M * PP, C)

    # see the corr_lattice_fused2 barrier note (operand-copy fusion tax)
    tabs, scal = jax.lax.optimization_barrier((tabs, scal))

    band1, band2 = pl.pallas_call(
        functools.partial(_kernel_lat, C=C, PP=PP, D=D, M=M, NI=NI),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NB,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(
                    (1, M * PP, C), lambda b, tb: (tb[b, 3], 0, 0)
                ),
                pl.BlockSpec(
                    (1, 1, M, 4 + 2 * PP),
                    lambda b, tb: (tb[b, 0], tb[b, 1], 0, 0),
                    memory_space=pltpu.SMEM,
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (1, 1, M, PP, 1, D * TX),
                    lambda b, tb: (tb[b, 4], tb[b, 1], 0, 0, 0, 0),
                ),
                pl.BlockSpec(
                    (1, 1, M, PP, 1, D * TX),
                    lambda b, tb: (tb[b, 4], tb[b, 1], 0, 0, 0, 0),
                ),
            ],
            scratch_shapes=[
                pltpu.VMEM((Hp1, Wp1, C), fmap1.dtype),
                pltpu.VMEM((Hp2, Wp2, C), fmap2.dtype),
                pltpu.VMEM((GANG * 2 * TY * TX, C), fmap1.dtype),
                pltpu.VMEM((GANG * PP, GANG * 2 * TY * TX), jnp.float32),
                pltpu.SMEM((1,), jnp.int32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((NI + 1, T, M, PP, 1, D * TX), jnp.bfloat16),
            jax.ShapeDtypeStruct((NI + 1, T, M, PP, 1, D * TX), jnp.bfloat16),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(tabs, fpad1, fpad2, gflat, scal)

    vmask = _cell_vmask(NI, T, M, r, n, cell_valid)

    b1 = band1[:NI].reshape(E, PP, D, TX)
    b2 = band2[:NI].reshape(E, PP, D, TX)
    return b1, b2, prep1, prep2, vmask, (E, P, R, D)


@functools.partial(
    jax.jit, static_argnames=("r", "radius", "interpret", "prepadded", "hw")
)
def corr_lattice2(
    gmap_r: jnp.ndarray,    # [MEM, M, P, P, C] gmap ring
    fmap1: jnp.ndarray,     # [MEM, H, W, C]   level-1 ring
    fmap2: jnp.ndarray,     # [MEM, H//4, W//4, C] level-2 ring
    coords: jnp.ndarray,    # [NI, T, M, P, P, 2] lattice-ordered coords
    cell_valid: jnp.ndarray,  # [NI, T] bool
    n,                      # traced int32: live keyframe count
    slotmap: jnp.ndarray,   # [L] int32 logical frame -> ring slot
    r: int,                 # PATCH_LIFETIME (static)
    radius: int = 3,
    interpret: bool = False,
    prepadded: bool = False,
    hw=None,                # (H1, W1, H2, W2) when prepadded
):
    """Two-level correlation over the edge lattice (see vo/state.py).

    Semantics identical to ops.corr over the flat edge view, but the
    lattice structure removes its per-update costs: no argsort/scatter of
    60k edges, no unsort gather of the output, no XLA gather of 138MB of
    patch features, and invalid cells cost ~nothing (skipped blocks).
    Returns (corr1, corr2) as [NI*T*M, P, P, (2R+1)^2]."""
    b1, b2, prep1, prep2, vmask, (E, P, R, D) = _lattice_bands(
        gmap_r, fmap1, fmap2, coords, cell_valid, n, slotmap,
        r, radius, interpret, prepadded, hw,
    )
    return (_finish_aligned(b1, prep1, E, P, R, D, vmask),
            _finish_aligned(b2, prep2, E, P, R, D, vmask))


@functools.partial(
    jax.jit,
    static_argnames=("r", "radius", "interpret", "prepadded", "hw", "folded"),
)
def corr_lattice2_stacked(
    gmap_r, fmap1, fmap2, coords, cell_valid, n, slotmap,
    r: int, radius: int = 3, interpret: bool = False,
    prepadded: bool = False, hw=None, folded: bool = False,
):
    """corr_lattice2 fused straight into the Update operator's input layout
    [E, P*P*(2R+1)^2*2] (level fastest — ops/corr.py corr_stack), in the
    band dtype (bf16). One fused elementwise pass over the kernel output
    instead of per-level f32 finishes + stack + reshape (those materialized
    ~4x the traffic and dominated the op's fixed cost).

    `folded=True`: emit the FOLDED layout [E, (lvl, py, px, y, x)] — no
    window transpose, no level interleave. Those are static column
    permutations of the reference layout, so the consumer folds them into
    the corr-MLP's first Dense kernel instead (`folded_corr_perm`); the
    [E,P,P,7,7] minor-dim transpose + interleave cost several ms of XLA
    relayout per update."""
    b1, b2, prep1, prep2, vmask, (E, P, R, D) = _lattice_bands(
        gmap_r, fmap1, fmap2, coords, cell_valid, n, slotmap,
        r, radius, interpret, prepadded, hw,
    )
    d = 2 * R + 1

    def blend(band, prep):
        x, y, x0, y0, _, _, _, _, ok = prep
        m = ok.reshape(E, P, P)[..., None, None] & vmask.reshape(
            E, 1, 1, 1, 1
        )
        vol = band[..., :D].reshape(E, P, P, D, D).astype(jnp.float32)
        vol = jnp.where(m, vol, 0.0)
        fx = (x - x0.astype(jnp.float32))[..., None, None]
        fy = (y - y0.astype(jnp.float32))[..., None, None]
        out = (
            (1 - fy) * (1 - fx) * vol[..., :d, :d]
            + (1 - fy) * fx * vol[..., :d, 1:]
            + fy * (1 - fx) * vol[..., 1:, :d]
            + fy * fx * vol[..., 1:, 1:]
        )
        if folded:
            return out  # [E, P, P, y, x], permute folded into the consumer
        # reference window-order permute: out[..., a, b] <- blend[..., b, a]
        return jnp.swapaxes(out, -1, -2)

    o1 = blend(b1, prep1)
    o2 = blend(b2, prep2)
    if folded:
        out = jnp.concatenate(
            [o1.reshape(E, P * P * d * d), o2.reshape(E, P * P * d * d)],
            axis=1,
        )
    else:
        out = jnp.stack([o1, o2], axis=-1).reshape(E, P * P * d * d * 2)
    return out.astype(b1.dtype)


def _pack_window_scalars(prep, E, PP):
    """Per-window packed scalar for the fused kernel: tile offset (8b) |
    fx (10b fixed-point) | fy (10b) | in-tile ok (1b)."""
    x, y, x0, y0, ty, tx, oy, ox, ok = prep
    off = (oy * TX + ox).reshape(E, PP)
    fx = jnp.clip(
        jnp.round((x - x0.astype(jnp.float32)) * 1024.0), 0, 1023
    ).astype(jnp.int32).reshape(E, PP)
    fy = jnp.clip(
        jnp.round((y - y0.astype(jnp.float32)) * 1024.0), 0, 1023
    ).astype(jnp.int32).reshape(E, PP)
    okb = ok.reshape(E, PP).astype(jnp.int32)
    return ty, tx, off | (fx << 8) | (fy << 18) | (okb << 28)


def _prep_pack_planar(u, v, uc, vc, H, W, R, D, pad, spread=SPREAD,
                      tyl=TY):
    """_level_prep + _pack_window_scalars on PLANAR coordinates.

    u, v: [NC, M*PP] per-window reprojected pixel coords; uc, vc: [NC, M]
    the patch-center coords (= the window that defines each edge's tile
    base, matching _level_prep's sy[:, P//2, P//2]). All arithmetic runs on
    [NC, M*PP] / [NC, M] arrays (minor dims 864 / 96) — the interleaved
    [E, P, P, 2] form has minor dims (3, 2) that XLA tiles to (8, 128), a
    ~170x physical padding paid on every materialization (the r03 in-frame
    reproject cost). Returns (ty, tx [NC, M] int32, vpack [NC, M*PP] int32).
    """
    M = uc.shape[1]
    PP = u.shape[1] // M

    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    sy = jnp.clip(y0.astype(jnp.int32), -D, H + D) - R + pad
    sx = jnp.clip(x0.astype(jnp.int32), -D, W + D) - R + pad

    syc = jnp.clip(jnp.floor(vc).astype(jnp.int32), -D, H + D) - R + pad
    sxc = jnp.clip(jnp.floor(uc).astype(jnp.int32), -D, W + D) - R + pad
    ty = syc - spread
    tx = ((sxc - spread) // 8) * 8

    def expand(a):  # [NC, M] -> [NC, M*PP] (broadcast over the PP lanes)
        return jnp.broadcast_to(
            a[:, :, None], (a.shape[0], M, PP)
        ).reshape(a.shape[0], M * PP)

    oy = sy - expand(ty)
    ox = sx - expand(tx)
    ok = (oy >= 0) & (oy <= tyl - D) & (ox >= 0) & (ox <= TX - D)
    oy = jnp.clip(oy, 0, tyl - D)
    ox = jnp.clip(ox, 0, TX - D)

    off = oy * TX + ox
    fx = jnp.clip(jnp.round((u - x0) * 1024.0), 0, 1023).astype(jnp.int32)
    fy = jnp.clip(jnp.round((v - y0) * 1024.0), 0, 1023).astype(jnp.int32)
    vpack = off | (fx << 8) | (fy << 18) | (ok.astype(jnp.int32) << 28)
    return ty, tx, vpack


@functools.partial(
    jax.jit,
    static_argnames=("r", "radius", "interpret", "prepadded", "hw", "ablate",
                     "pin_inputs", "lat"),
)
def corr_lattice_fused2(
    gmap_r, fmap1, fmap2, coords, cell_valid, n, slotmap,
    r: int, radius: int = 3, interpret: bool = False,
    prepadded: bool = False, hw=None, ablate=(), pin_inputs: bool = True,
    lat=None,
) -> jnp.ndarray:
    """The production lattice correlation (`_kernel_lat_fused2`): binary-roll
    window alignment + 8x8 compaction + bilinear blend in-kernel, direct
    slice->MXU dots, pipelined scalar columns. Output contract:
    [NI*T*M, PP*128] bf16 paired layout. `ablate`: timing-only phase drops
    (see _kernel_lat_fused2) — never set in production.

    `coords` may be the interleaved [NI, T, M, P, P, 2] array OR a PLANAR
    tuple (u, v, uc, vc) with u, v [NI*T, M*PP] per-window level-1 coords
    and uc, vc [NI*T, M] patch-center coords (pass `lat`=(NI, T, M, P)
    static) — the planar form skips the interleaved array's catastrophic
    (3, 2)-minor-dim layout entirely (see _prep_pack_planar).

    `pin_inputs=True` (default): the gmap ring and the packed per-window
    scalar columns enter as WHOLE arrays with constant block indices, so
    Pallas DMAs them into VMEM once instead of re-issuing two input-block
    DMAs per valid cell (~625 cells x 2 x ~6 us issue latency — the phase
    ablation measured the kernel 61% fixed-cost, dominated by DMA issues,
    not compute). Costs ~13 MB extra VMEM; the kernel indexes the ring
    slot / lattice cell directly."""
    planar = isinstance(coords, tuple)
    if planar:
        u1, v1_, uc1, vc1 = coords
        NI, T, M, P = lat
    else:
        NI, T, M, P, _, _ = coords.shape
    if prepadded:
        MEM, C = fmap1.shape[0], fmap1.shape[3]
        H1, W1, H2, W2 = hw
    else:
        MEM, H1, W1, C = fmap1.shape
        _, H2, W2, _ = fmap2.shape
    L = slotmap.shape[0]
    R = radius
    D = 2 * R + 2
    PP = P * P
    pad = 3 * D
    E = NI * T * M
    assert M % GANG == 0, "lattice kernel needs M % 8 == 0"
    assert D == 8, "fused kernel packs 8x8 windows into 64 lanes"

    tabs, NB = _cell_tables(NI, T, M, r, n, cell_valid, slotmap, MEM, L)

    if planar:
        tyA, txA, vA = _prep_pack_planar(
            u1, v1_, uc1, vc1, H1, W1, R, D, pad)
        tyB, txB, vB = _prep_pack_planar(
            u1 / 4.0, v1_ / 4.0, uc1 / 4.0, vc1 / 4.0, H2, W2, R, D, pad,
            spread=SPREAD2, tyl=TY2)
        scal = jnp.stack([tyA, txA, tyB, txB], axis=-1).astype(
            jnp.int32).reshape(NI, T, M, 4)
        vcol = jnp.stack([vA, vB], axis=-1).reshape(NI, T, M * PP, 2)
    else:
        cflat = coords.reshape(E, P, P, 2)
        prep1 = _level_prep(cflat, H1, W1, P, R, D, pad)
        prep2 = _level_prep(cflat / 4.0, H2, W2, P, R, D, pad,
                            spread=SPREAD2, tyl=TY2)

        ty1, tx1, v1 = _pack_window_scalars(prep1, E, PP)
        ty2, tx2, v2 = _pack_window_scalars(prep2, E, PP)
        scal = jnp.concatenate(
            [ty1[:, None], tx1[:, None], ty2[:, None], tx2[:, None]], axis=1,
        ).astype(jnp.int32).reshape(NI, T, M, 4)
        vcol = jnp.stack([v1, v2], axis=-1).reshape(NI, T, M * PP, 2)

    if prepadded:
        fpad1, fpad2 = fmap1, fmap2
    else:
        fpad1 = _pad_ring(fmap1, pad)
        fpad2 = _pad_ring(fmap2, pad)
    Hp1, Wp1 = fpad1.shape[1], fpad1.shape[2]
    Hp2, Wp2 = fpad2.shape[1], fpad2.shape[2]

    gflat = gmap_r.reshape(MEM, M * PP, C)

    # compile-time constant (blend-folded S4 extraction matrix), one
    # pinned VMEM input — see the kernel comment for why it must not be
    # built in-kernel (no DCE + no hardware int div)
    consts = jnp.asarray(_s4_consts(D))

    # pinned: the whole gmap ring enters as ONE constant-index block (8.8 MB
    # at bench shapes, lane dim C=128 so no padding blowup) -> loaded once.
    # vcol CANNOT be pinned the same way: its last dim (2) pads to 128
    # lanes in VMEM, so the full array would allocate 64x its real size
    # (276 MB > VMEM); it stays a per-step block.
    if pin_inputs:
        g_spec = pl.BlockSpec((MEM, M * PP, C), lambda b, tb: (0, 0, 0))
    else:
        g_spec = pl.BlockSpec((1, M * PP, C), lambda b, tb: (tb[b, 3], 0, 0))
    if "novcol" in ablate:  # timing: constant index -> one DMA total
        vcol_spec = pl.BlockSpec(
            (1, 1, M * PP, 2), lambda b, tb: (0, 0, 0, 0)
        )
    else:
        vcol_spec = pl.BlockSpec(
            (1, 1, M * PP, 2), lambda b, tb: (tb[b, 0], tb[b, 1], 0, 0)
        )
    if "noscal" in ablate:  # timing: constant scal index -> one SMEM DMA
        scal_spec = pl.BlockSpec(
            (1, 1, M, 4), lambda b, tb: (0, 0, 0, 0),
            memory_space=pltpu.SMEM,
        )
    else:
        scal_spec = pl.BlockSpec(
            (1, 1, M, 4), lambda b, tb: (tb[b, 0], tb[b, 1], 0, 0),
            memory_space=pltpu.SMEM,
        )
    if "pinout" in ablate:  # timing: every step writes the trash row
        out_spec = pl.BlockSpec(
            (1, 1, M, PP, 128), lambda b, tb: (NI, 0, 0, 0, 0)
        )
    else:
        out_spec = pl.BlockSpec(
            (1, 1, M, PP, 128), lambda b, tb: (tb[b, 4], tb[b, 1], 0, 0, 0)
        )
    if "nobar" not in ablate:
        # CRITICAL (+8 ms/call at bench shapes if omitted): without a
        # barrier XLA fuses the scal/vcol producers into the Mosaic
        # custom call's operand copies with catastrophic minor-dim-2
        # tiling ("scal/vcol in-graph" 29.8 ms vs 21.8 with the barrier
        # vs 19.9 arg-fed, same process). The barrier forces a clean
        # default-layout materialization first.
        tabs, scal, vcol = jax.lax.optimization_barrier((tabs, scal, vcol))

    if "noker" in ablate:
        # timing: XLA prologue + epilogue WITHOUT the kernel. The cheap
        # reduction keeps every kernel input alive (no DCE); the broadcast
        # write matches the kernel's output-buffer cost.
        keep = (jnp.sum(tabs).astype(jnp.float32)
                + jnp.sum(scal).astype(jnp.float32)
                + jnp.sum(vcol).astype(jnp.float32)
                + fpad1[0, 0, 0, 0].astype(jnp.float32)
                + fpad2[0, 0, 0, 0].astype(jnp.float32)
                + gflat[0, 0, 0].astype(jnp.float32))
        out = jnp.zeros((NI + 1, T, M, PP, 128), jnp.bfloat16
                        ) + keep.astype(jnp.bfloat16)
        vmask = _cell_vmask(NI, T, M, r, n, cell_valid)
        return jnp.where(
            vmask[:, None], out[:NI].reshape(E, PP * 128), jnp.bfloat16(0.0)
        )

    out = pl.pallas_call(
        functools.partial(_kernel_lat_fused2, C=C, PP=PP, D=D, M=M, NI=NI,
                          ablate=tuple(ablate), pin_inputs=pin_inputs),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NB // 2 if "halfgrid" in ablate else NB,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                g_spec,
                scal_spec,
                vcol_spec,
                pl.BlockSpec((D * TX, 256), lambda b, tb: (0, 0)),
            ],
            out_specs=out_spec,
            scratch_shapes=[
                pltpu.VMEM((Hp1, Wp1, C), fmap1.dtype),
                pltpu.VMEM((Hp2, Wp2, C), fmap2.dtype),
                # f32: Mosaic dynamic rotate needs 32-bit lanes (bf16
                # staging here was the r02 miscompile regression)
                pltpu.VMEM((GANG, PP, TY * TX), jnp.float32),
                pltpu.VMEM((GANG, PP, TY2 * TX), jnp.float32),
                pltpu.SMEM((1,), jnp.int32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (NI + 1, T, M, PP, 128), jnp.bfloat16
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(tabs, fpad1, fpad2, gflat, scal, vcol, consts)

    if "noepi" in ablate:  # timing: skip the validity-mask epilogue
        return out[:NI].reshape(E, PP * 128)
    vmask = _cell_vmask(NI, T, M, r, n, cell_valid)
    return jnp.where(
        vmask[:, None], out[:NI].reshape(E, PP * 128), jnp.bfloat16(0.0)
    )


# ---------------------------------------------------------------------------
# fused3: strip-major tiles — the per-edge tile slice becomes a contiguous
# 2-D sublane slice (no Mosaic relayout between the VMEM read and the MXU)
# ---------------------------------------------------------------------------

SPREAD2_S = 1         # level-2 spread for the strip kernel (coords are 4x
TY2S = 10             # compressed, so 1 px is exact for in-spread windows)
ROLLW2 = 256          # level-2 roll width: TY2S*TX=240 padded to 2 lane-tiles


def n_strips(wp: int) -> int:
    """8-aligned x-bases whose TX-wide strip fits in a padded width wp."""
    return (wp - TX) // 8 + 1


def strips_shape(h: int, w: int, pad: int = RING_PAD) -> tuple:
    hp, wp = ring_padded_shape(h, w, pad)
    return n_strips(wp), hp * TX


def make_strips(fpad: jnp.ndarray) -> jnp.ndarray:
    """[S, Hp, Wp, C] padded ring -> strip-major [S, NX, Hp*TX, C]:
    strips[s, b, y*TX + x, c] = fpad[s, y, 8*b + x, c].

    In the strip layout a (tyl, TX) window tile at 8-aligned x-base 8*b is
    ONE contiguous sublane slice [b, ty*TX : ty*TX + tyl*TX, :] (offsets and
    extents are multiples of 8 since 8 | TX) — the [tyl, TX, C] ->
    (tyl*TX, C) reshape that Mosaic must otherwise materialize per
    edge-level (~98 kB x 2 levels x every edge) disappears. Cost: 3x the
    ring bytes (strips overlap by TX - 8).

    Built as ONE take + block transpose (minor dims (TX, C) stay intact)
    rather than an NX-slice stack — the stack emitted NX separate slice
    copies plus a relayout at commit time."""
    S, Hp, Wp, C = fpad.shape
    NX = n_strips(Wp)
    cols = (jnp.arange(NX)[:, None] * 8
            + jnp.arange(TX)[None, :]).reshape(-1)
    g = jnp.take(fpad, cols, axis=2)                   # [S, Hp, NX*TX, C]
    g = g.reshape(S, Hp, NX, TX, C).transpose(0, 2, 1, 3, 4)
    return g.reshape(S, NX, Hp * TX, C)


def _kernel_lat_fused3(tabs, strips1, strips2, g_ref, scal_ref,
                       vcol_ref, consts_ref, out_ref, *,
                       C, PP, D, M, NI, gang=GANG, ablate=(),
                       pin_inputs=False, roll_bf16=False, vcol_lane=False):
    """corr_lattice_fused2 on strip-major feature rings.

    Differences from _kernel_lat_fused2 (semantics otherwise identical):

      * the slot arrives as a PIPELINED whole-slot input block
        [1, NX, Hp*TX, C] (Pallas double-buffers it, overlapping the
        ~32 MB strip DMA with compute; _cell_tables forward-fills invalid
        steps' slot index so runs stay contiguous and revisits skip the
        copy) — the manual start+wait loader stalled the grid for the
        full DMA on every slot change;
      * a tile is `strips[0, b, ty*TX : ty*TX + tyl*TX, :]` — a
        contiguous, 8-aligned 2-D sublane slice that feeds the MXU dot
        with NO relayout (the fused2 [tyl, TX, C] slice + reshape forces
        a per-edge-level VMEM relayout copy);
      * level 2 runs the small exact tile (TY2S=10, SPREAD2_S=1): 2 MXU
        column tiles instead of 3 and 7 roll bits instead of 8, on a
        256-lane roll width (needed output lanes never read the [240, 256)
        zero pad: max window lane 175 + max off 64 = 239);
      * the dot->roll->extract chain stays IN REGISTERS: the gang's dot
        results concatenate to [gang*PP, W] directly — a [gang, PP, W]
        VMEM scratch roundtrip relayouts on readback (PP=9 rows are not
        sublane-tile aligned; partial lane-range stores additionally
        read-modify-write, measured +2.6 ms/call).

    Ref semantics: altcorr/correlation_kernel.cu:83-136,221-232."""
    b = pl.program_id(0)
    valid = tabs[b, 4] < NI

    # the roll/select/extract chain is VPU-op-count bound (~3 vops/vreg x
    # 13-15 chained bits on [gang*PP, 256..384]); bf16 halves the vreg
    # count of every roll, select, and the extraction matmul LHS. The
    # output is bf16 anyway — this moves the rounding one stage earlier
    # (STATIC-amount rolls only; the r02 Mosaic bf16 failure was
    # dynamic_rotate).
    rdt = jnp.bfloat16 if roll_bf16 else jnp.float32

    @pl.when(valid)
    def _compute():
        S4 = consts_ref[...].astype(rdt)              # [D*TX, 256]

        def edge_gang(i, carry):
            gi = tabs[b, 3] if pin_inputs else 0
            g_gang = g_ref[gi, pl.ds(i * gang * PP, gang * PP), :]
            dms = ([], [])
            for u in range(gang):
                e = i * gang + u
                g_u = g_gang[u * PP:(u + 1) * PP, :]        # [PP, C]
                for lvl, strips, tyl, W_rs in (
                    (0, strips1, TY, TY * TX), (1, strips2, TY2S, ROLLW2)
                ):
                    if "dots" in ablate:
                        dms[lvl].append(jnp.zeros((PP, W_rs), rdt))
                        continue
                    tile = strips[
                        0,
                        scal_ref[0, 0, 2 * lvl + 1, e],
                        pl.ds(
                            pl.multiple_of(
                                scal_ref[0, 0, 2 * lvl, e] * TX, 8
                            ),
                            tyl * TX,
                        ),
                        :,
                    ]                                       # [tyl*TX, C]
                    dm = jax.lax.dot_general(
                        g_u, tile,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).astype(rdt)
                    if W_rs > tyl * TX:
                        dm = jnp.concatenate(
                            [dm, jnp.zeros((PP, W_rs - tyl * TX), dm.dtype)],
                            axis=1,
                        )
                    dms[lvl].append(dm)

            outs = []
            for lvl, nbits in (
                (0, _nbits(TY)), (1, _nbits(TY2S))
            ):
                # in-REGISTER gang assembly: a [gang, PP, W] VMEM scratch
                # roundtrip relayouts on readback (PP=9 rows are not
                # sublane-tile aligned); the concat keeps the whole
                # dot->roll->extract chain in registers
                r_ = jnp.concatenate(dms[lvl], axis=0)  # [gang*PP, W]
                W_roll = r_.shape[-1]
                if "novcol" in ablate:
                    v_ = jnp.full((gang * PP, 1), (1 << 28) | 37, jnp.int32)
                elif vcol_lane:
                    # lane-packed layout [.., gang*PP, NG*2]: one column
                    # per (gang, level); i is python-static (the gang
                    # loop is unrolled in this mode)
                    v_ = vcol_ref[0, 0, :, 2 * i + lvl: 2 * i + lvl + 1]
                else:
                    v_ = vcol_ref[
                        0, 0, pl.ds(i * gang * PP, gang * PP), pl.ds(lvl, 1)
                    ]                              # [gang*PP, 1]
                off = v_ & 255
                if "rolls" not in ablate:
                    # narrow rolls: rotations commute, so apply the high
                    # bits on the full width, then truncate to 256 lanes
                    # (2 lane-tiles) for the low 6 — the residual offset
                    # <= 63 keeps every needed window lane < 255. Cuts the
                    # per-bit roll+select vreg count by 1/3 for 6 of the
                    # 8 level-1 bits.
                    hi = [b for b in range(nbits) if b >= 6]
                    for bit in hi:
                        rolled = pltpu.roll(r_, W_roll - (1 << bit), 1)
                        r_ = jnp.where(((off >> bit) & 1) == 1, rolled, r_)
                    if W_roll > 256:
                        r_ = r_[:, :256]
                        W_roll = 256
                    for bit in range(min(nbits, 6)):
                        rolled = pltpu.roll(r_, W_roll - (1 << bit), 1)
                        r_ = jnp.where(((off >> bit) & 1) == 1, rolled, r_)
                if "smat" in ablate:
                    c4 = jnp.concatenate([r_[:, :64]] * 4, axis=1)
                else:
                    c4 = jax.lax.dot_general(
                        r_[:, : D * TX], S4,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # [gang*PP, 256] = [c00 | c01 | c10 | c11]
                fx = ((v_ >> 8) & 1023).astype(jnp.float32) * (1.0 / 1024.0)
                fy = ((v_ >> 18) & 1023).astype(jnp.float32) * (1.0 / 1024.0)
                okm = ((v_ >> 28) & 1).astype(jnp.float32)
                if "blend" in ablate:
                    out_l = okm * c4[:, :64]
                else:
                    out_l = okm * (
                        (1 - fy) * (1 - fx) * c4[:, 0:64]
                        + (1 - fy) * fx * c4[:, 64:128]
                        + fy * (1 - fx) * c4[:, 128:192]
                        + fy * fx * c4[:, 192:256]
                    )
                outs.append(out_l)

            pair = jnp.concatenate(outs, axis=1)  # [gang*PP, 128]
            out_ref[0, 0, pl.ds(i * gang, gang)] = pair.astype(
                out_ref.dtype
            ).reshape(gang, PP, 128)
            return carry

        if "noloop" in ablate:
            pass
        elif vcol_lane or M // gang == 1:
            # whole-cell gang: no loop scaffolding for a single trip
            for _i in range(M // gang):
                edge_gang(_i, 0)
        else:
            jax.lax.fori_loop(0, M // gang, edge_gang, 0)


@functools.partial(
    jax.jit,
    static_argnames=("r", "radius", "interpret", "prestripped", "hw",
                     "ablate", "pin_inputs", "lat", "roll_bf16",
                     "vcol_lane"),
)
def corr_lattice_fused3(
    gmap_r, fmap1, fmap2, coords, cell_valid, n, slotmap,
    r: int, radius: int = 3, interpret: bool = False,
    prestripped: bool = False, hw=None, ablate=(), pin_inputs: bool = True,
    lat=None, roll_bf16: bool = False, vcol_lane: bool = False,
) -> jnp.ndarray:
    """Strip-major lattice correlation (`_kernel_lat_fused3`). Same
    output contract as corr_lattice_fused2 ([NI*T*M, PP*128] bf16 paired
    layout); same planar-coords support.

    fmap1/fmap2: either raw rings [MEM, H, W, C] (strips built in-graph —
    A/B and CPU-test path) or, with `prestripped=True`, strip-major rings
    [MEM, NX, Hp*TX, C] from `make_strips` (production: built incrementally
    at commit). `hw` = (H1, W1, H2, W2) is required when prestripped.

    Level 2 uses the small exact tile (SPREAD2_S=1): windows whose level-1
    px offset exceeds SPREAD are zeroed at level 2 as well (fused2 with
    SPREAD2=4 kept some of those); both are approximations of out-of-spread
    geometry the BA robust gates discard (ba_cuda.cu:296-308)."""
    planar = isinstance(coords, tuple)
    if planar:
        u1, v1_, uc1, vc1 = coords
        NI, T, M, P = lat
    else:
        NI, T, M, P, _, _ = coords.shape
    R = radius
    D = 2 * R + 2
    PP = P * P
    pad = 3 * D
    E = NI * T * M
    assert M % GANG == 0, "lattice kernel needs M % 8 == 0"
    assert D == 8, "fused kernel packs 8x8 windows into 64 lanes"
    # wider gangs amortize the per-chain overhead of the roll/select
    # chains (exact parity on chip at every width): 16 -> 32 measured
    # -1.55 ms/call at bench shapes, 32 -> 96 (the whole cell in one
    # chain) another -0.4 (r05). Ladder keeps non-multiple configs on
    # the old widths.
    gang = next(g for g in (96, 48, 32, 16, GANG) if M % g == 0)

    if prestripped:
        MEM, C = fmap1.shape[0], fmap1.shape[3]
        H1, W1, H2, W2 = hw
        strips1_r, strips2_r = fmap1, fmap2
    else:
        MEM, H1, W1, C = fmap1.shape
        _, H2, W2, _ = fmap2.shape
        strips1_r = make_strips(_pad_ring(fmap1, pad))
        strips2_r = make_strips(_pad_ring(fmap2, pad))
    NX1, HT1 = strips1_r.shape[1], strips1_r.shape[2]
    NX2, HT2 = strips2_r.shape[1], strips2_r.shape[2]
    L = slotmap.shape[0]

    tabs, NB = _cell_tables(NI, T, M, r, n, cell_valid, slotmap, MEM, L)

    if planar:
        tyA, txA, vA = _prep_pack_planar(
            u1, v1_, uc1, vc1, H1, W1, R, D, pad)
        tyB, txB, vB = _prep_pack_planar(
            u1 / 4.0, v1_ / 4.0, uc1 / 4.0, vc1 / 4.0, H2, W2, R, D, pad,
            spread=SPREAD2_S, tyl=TY2S)
        # scal rides flat [NI, T, 4, M] (lane dim M=96): the [.., M, 4]
        # form pads its minor dim 4 -> 128 in HBM (30 MB physical for a
        # 1.2 MB table, written+read per update)
        scal = jnp.stack(
            [tyA, txA // 8, tyB, txB // 8], axis=1
        ).astype(jnp.int32).reshape(NI, T, 4, M)
        vA_, vB_ = vA, vB
    else:
        cflat = coords.reshape(E, P, P, 2)
        prep1 = _level_prep(cflat, H1, W1, P, R, D, pad)
        prep2 = _level_prep(cflat / 4.0, H2, W2, P, R, D, pad,
                            spread=SPREAD2_S, tyl=TY2S)
        ty1, tx1, v1 = _pack_window_scalars(prep1, E, PP)
        ty2, tx2, v2 = _pack_window_scalars(prep2, E, PP)
        scal = jnp.stack(
            [ty1.reshape(NI * T, M), tx1.reshape(NI * T, M) // 8,
             ty2.reshape(NI * T, M), tx2.reshape(NI * T, M) // 8], axis=1,
        ).astype(jnp.int32).reshape(NI, T, 4, M)
        vA_ = v1.reshape(NI * T, M * PP)
        vB_ = v2.reshape(NI * T, M * PP)

    NC_ = NI * T
    NG = M // gang
    if vcol_lane:
        # lane-packed window scalars [NI, T, gang*PP, NG*2] (one column
        # per (gang, level), read at a python-static lane by the unrolled
        # gang loop): the [.., M*PP, 2] form pads its minor dim 2 -> 128
        # in HBM — 276 MB physical for a 4.3 MB table, written + DMA-read
        # per update. MEASURED DEAD END r05 (non-default): exact parity
        # but +0.54 ms/call at bench shapes — the 6x-unrolled gang body
        # costs more than the saved table traffic
        vcol = jnp.stack(
            [vA_.reshape(NC_, NG, gang * PP),
             vB_.reshape(NC_, NG, gang * PP)], axis=2,
        ).transpose(0, 3, 1, 2).reshape(NI, T, gang * PP, NG * 2)
    else:
        vcol = jnp.stack([vA_, vB_], axis=-1).reshape(NI, T, M * PP, 2)

    gflat = gmap_r.reshape(MEM, M * PP, C)

    consts = jnp.asarray(_s4_consts(D))

    if pin_inputs:
        g_spec = pl.BlockSpec((MEM, M * PP, C), lambda b, tb: (0, 0, 0))
    else:
        g_spec = pl.BlockSpec((1, M * PP, C), lambda b, tb: (tb[b, 3], 0, 0))
    vcol_spec = pl.BlockSpec(
        (1, 1) + vcol.shape[2:], lambda b, tb: (tb[b, 0], tb[b, 1], 0, 0)
    )
    scal_spec = pl.BlockSpec(
        (1, 1, 4, M), lambda b, tb: (tb[b, 0], tb[b, 1], 0, 0),
        memory_space=pltpu.SMEM,
    )
    out_spec = pl.BlockSpec(
        (1, 1, M, PP, 128), lambda b, tb: (tb[b, 4], tb[b, 1], 0, 0, 0)
    )
    # timing-only A/B ablations (garbage output): pin the big slot input /
    # the out block to constants so EVERY grid step revisits the same
    # block and Pallas elides the DMA — isolates slot-DMA and out-DMA
    # shares of the kernel's fixed cost (scripts/ab_fused3_phases.py)
    if "pinslot" in ablate:
        tabs = tabs.at[:, 2].set(0)
    if "pinout" in ablate:
        tabs = tabs.at[:, 4].set(NI)

    if "nobar" not in ablate:
        # see the corr_lattice_fused2 barrier note (operand-copy fusion tax)
        tabs, scal, vcol = jax.lax.optimization_barrier((tabs, scal, vcol))

    out = pl.pallas_call(
        functools.partial(_kernel_lat_fused3, C=C, PP=PP, D=D, M=M, NI=NI,
                          gang=gang, ablate=tuple(ablate),
                          pin_inputs=pin_inputs, roll_bf16=roll_bf16,
                          vcol_lane=vcol_lane),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NB,),
            in_specs=[
                # whole-slot pipelined blocks: Pallas double-buffers the
                # strip DMA behind compute; forward-filled slot indices
                # (see _cell_tables) keep index runs contiguous
                pl.BlockSpec(
                    (1, NX1, HT1, C), lambda b, tb: (tb[b, 2], 0, 0, 0)
                ),
                pl.BlockSpec(
                    (1, NX2, HT2, C), lambda b, tb: (tb[b, 2], 0, 0, 0)
                ),
                g_spec,
                scal_spec,
                vcol_spec,
                pl.BlockSpec((D * TX, 256), lambda b, tb: (0, 0)),
            ],
            out_specs=out_spec,
            scratch_shapes=[],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (NI + 1, T, M, PP, 128), jnp.bfloat16
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(tabs, strips1_r, strips2_r, gflat, scal, vcol, consts)

    vmask = _cell_vmask(NI, T, M, r, n, cell_valid)
    return jnp.where(
        vmask[:, None], out[:NI].reshape(E, PP * 128), jnp.bfloat16(0.0)
    )


# ---------------------------------------------------------------------------
# fused4: cell-batched strip-major kernel (one grid step per target t-band)
# ---------------------------------------------------------------------------

TB4 = 13              # lattice cells (t values) per fused4 grid step


def _cell_tables_a(NI, T, M, PP, r, n, slotmap, MEM, L, TB):
    """Per-(target, t-band) tables for the cell-batched fused4 kernel.

    fused3 pays the Pallas grid machinery (index maps, block-change
    checks, DMA issue) once per lattice CELL — measured ~7.7 us x 546
    steps ~= 4.2 ms/update, the kernel's largest fixed term (r04 phase
    ablation). fused4 batches all of a target's cells that share a t-band
    into ONE grid step (the strip slot is per-target, so the big DMA
    amortizes identically) and walks t with an in-kernel dynamic-bound
    fori_loop, shrinking the grid NTGT*T -> NTGT*ceil(T/TB) steps.

    In (target a, offset t) space a cell is live iff
      max(0, a-NI+2) <= t <= min(T-1, a+1+min(0, n-NI))    (see
    _compact_cells for the n-independent part) and the target exists
    (j = n-NTGT+a >= 0). Returns (tabs [NTGT*NTB, 6] int32, gidx
    [NTGT, Tp] int32 lattice source rows, gslot [NTGT, Tp] int32 host
    feature slots, NTB): tabs rows are (tab_a, tband_io, slot_j,
    out_row, tlo_rel, thi_rel); out_row == NTGT routes invalid steps to
    the trash row; slot_j is forward-filled so pipelined whole-slot
    input blocks see contiguous runs."""
    NTGT = NI + r - 2
    NTB = -(-T // TB)
    Tp = NTB * TB

    a = jnp.arange(NTGT, dtype=jnp.int32)
    j = n - NTGT + a
    tlo_a = jnp.maximum(0, a - NI + 2)
    thi_a = jnp.minimum(T - 1, a + 1 + jnp.minimum(0, n - NI))
    # per-band relative bounds
    a2 = jnp.repeat(a, NTB)
    j2 = jnp.repeat(j, NTB)
    tband = jnp.tile(jnp.arange(NTB, dtype=jnp.int32), NTGT)
    lo_rel = jnp.clip(jnp.repeat(tlo_a, NTB) - tband * TB, 0, TB)
    hi_rel = jnp.clip(jnp.repeat(thi_a, NTB) - tband * TB, -1, TB - 1)
    valid = (j2 >= 0) & (hi_rel >= lo_rel)

    slot_j = jnp.clip(slotmap[jnp.clip(j2, 0, L - 1)], 0, MEM - 1)
    NB = NTGT * NTB
    bidx = jnp.arange(NB, dtype=jnp.int32)
    vidx = jnp.where(valid, bidx, -1)
    fidx = jax.lax.cummax(vidx)
    first = jnp.argmax(valid)
    fill = jnp.clip(jnp.maximum(fidx, first), 0, NB - 1)
    slot_j = jnp.where(valid, slot_j, slot_j[fill])

    tabs = jnp.stack([
        jnp.where(valid, a2, 0),
        jnp.where(valid, tband, 0),
        slot_j,
        jnp.where(valid, a2, NTGT),
        jnp.where(valid, lo_rel, 1),
        jnp.where(valid, hi_rel, 0),
    ], axis=1).astype(jnp.int32)

    # a-space <- lattice gather rows and per-cell host feature slots
    tt = jnp.arange(Tp, dtype=jnp.int32)[None, :]
    i_cell = j[:, None] - tt + (r - 1)                 # [NTGT, Tp]
    row = jnp.mod(i_cell, NI)
    gidx = row * T + jnp.clip(tt, 0, T - 1)
    gslot = jnp.clip(
        slotmap[jnp.clip(i_cell, 0, L - 1)], 0, MEM - 1
    )
    return tabs, gidx, gslot, NTB


def _kernel_lat_fused4(tabs, strips1, strips2, g_ref, scal_ref,
                       vcol_ref, consts_ref, out_ref, *,
                       C, PP, D, M, NI, gang=GANG, ablate=()):
    """_kernel_lat_fused3 with the t-loop inside: one grid step covers a
    target's t-band, fori_loop(tlo, thi+1) over its live cells. The t
    axis is FLATTENED into the tiled sublane dim of the vcol/out blocks
    (row = tc*M*PP + ...), keeping every dynamic access an 8-aligned
    sublane offset (dynamic super-dim indexing mislowers; verified by
    scripts/probe_dynlane.py). Per-cell host feature slots ride scal
    column 4. Ref semantics: altcorr/correlation_kernel.cu:83-136,221-232."""
    b = pl.program_id(0)
    tlo = tabs[b, 4]
    thi = tabs[b, 5]

    S4 = consts_ref[...]                               # [D*TX, 256]

    def cell_body(tc, carry):
        gi = scal_ref[0, 0, 4, tc * M]
        cw = tc * M * PP

        def edge_gang(i, carry2):
            g_gang = g_ref[gi, pl.ds(i * gang * PP, gang * PP), :]
            dms = ([], [])
            for u in range(gang):
                e = i * gang + u
                g_u = g_gang[u * PP:(u + 1) * PP, :]        # [PP, C]
                for lvl, strips, tyl, W_rs in (
                    (0, strips1, TY, TY * TX), (1, strips2, TY2S, ROLLW2)
                ):
                    if "dots" in ablate:
                        dms[lvl].append(jnp.zeros((PP, W_rs), jnp.float32))
                        continue
                    tile = strips[
                        0,
                        scal_ref[0, 0, 2 * lvl + 1, tc * M + e],
                        pl.ds(
                            pl.multiple_of(
                                scal_ref[0, 0, 2 * lvl, tc * M + e] * TX, 8
                            ),
                            tyl * TX,
                        ),
                        :,
                    ]                                       # [tyl*TX, C]
                    dm = jax.lax.dot_general(
                        g_u, tile,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    if W_rs > tyl * TX:
                        dm = jnp.concatenate(
                            [dm,
                             jnp.zeros((PP, W_rs - tyl * TX), dm.dtype)],
                            axis=1,
                        )
                    dms[lvl].append(dm)

            outs = []
            for lvl, nbits in (
                (0, _nbits(TY)), (1, _nbits(TY2S))
            ):
                r_ = jnp.concatenate(dms[lvl], axis=0)  # [gang*PP, W]
                W_roll = r_.shape[-1]
                if "novcol" in ablate:
                    v_ = jnp.full(
                        (gang * PP, 1), (1 << 28) | 37, jnp.int32)
                else:
                    v_ = vcol_ref[
                        0, 0,
                        pl.ds(cw + i * gang * PP, gang * PP),
                        pl.ds(lvl, 1),
                    ]                              # [gang*PP, 1]
                off = v_ & 255
                if "rolls" not in ablate:
                    hi = [bb for bb in range(nbits) if bb >= 6]
                    for bit in hi:
                        rolled = pltpu.roll(r_, W_roll - (1 << bit), 1)
                        r_ = jnp.where(
                            ((off >> bit) & 1) == 1, rolled, r_)
                    if W_roll > 256:
                        r_ = r_[:, :256]
                        W_roll = 256
                    for bit in range(min(nbits, 6)):
                        rolled = pltpu.roll(r_, W_roll - (1 << bit), 1)
                        r_ = jnp.where(
                            ((off >> bit) & 1) == 1, rolled, r_)
                if "smat" in ablate:
                    c4 = jnp.concatenate([r_[:, :64]] * 4, axis=1)
                else:
                    c4 = jax.lax.dot_general(
                        r_[:, : D * TX], S4,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # [gang*PP, 256] = [c00 | c01 | c10 | c11]
                fx = ((v_ >> 8) & 1023).astype(jnp.float32) * (1.0 / 1024.0)
                fy = ((v_ >> 18) & 1023).astype(jnp.float32) * (1.0 / 1024.0)
                okm = ((v_ >> 28) & 1).astype(jnp.float32)
                if "blend" in ablate:
                    out_l = okm * c4[:, :64]
                else:
                    out_l = okm * (
                        (1 - fy) * (1 - fx) * c4[:, 0:64]
                        + (1 - fy) * fx * c4[:, 64:128]
                        + fy * (1 - fx) * c4[:, 128:192]
                        + fy * fx * c4[:, 192:256]
                    )
                outs.append(out_l)

            pair = jnp.concatenate(outs, axis=1)  # [gang*PP, 128]
            out_ref[
                0, 0, pl.ds(cw + i * gang * PP, gang * PP), :
            ] = pair.astype(out_ref.dtype)
            return carry2

        jax.lax.fori_loop(0, M // gang, edge_gang, 0)
        return carry

    if "noloop" in ablate:
        pass
    else:
        jax.lax.fori_loop(tlo, thi + 1, cell_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("r", "radius", "interpret", "prestripped", "hw",
                     "ablate", "lat", "tb"),
)
def corr_lattice_fused4(
    gmap_r, fmap1, fmap2, coords, cell_valid, n, slotmap,
    r: int, radius: int = 3, interpret: bool = False,
    prestripped: bool = False, hw=None, ablate=(), lat=None,
    tb: int = TB4,
) -> jnp.ndarray:
    """Cell-batched strip-major lattice correlation. Output contract and
    approximation level identical to corr_lattice_fused3 ([NI*T*M,
    PP*128] bf16 paired layout, level-2 small exact tile SPREAD2_S=1);
    the grid shrinks from one step per lattice cell to one per
    (target, t-band) with an in-kernel dynamic t-loop, and the kernel
    emits target-major cells that a row gather restores to lattice
    order (rides the same pass as the vmask kill).

    Ref semantics: altcorr/correlation_kernel.cu:83-136,221-232."""
    planar = isinstance(coords, tuple)
    if planar:
        u1, v1_, uc1, vc1 = coords
        NI, T, M, P = lat
    else:
        NI, T, M, P, _, _ = coords.shape
    R = radius
    D = 2 * R + 2
    PP = P * P
    pad = 3 * D
    E = NI * T * M
    NTGT = NI + r - 2
    assert M % GANG == 0, "lattice kernel needs M % 8 == 0"
    assert D == 8, "fused kernel packs 8x8 windows into 64 lanes"
    gang = 16 if M % 16 == 0 else GANG

    if prestripped:
        MEM, C = fmap1.shape[0], fmap1.shape[3]
        H1, W1, H2, W2 = hw
        strips1_r, strips2_r = fmap1, fmap2
    else:
        MEM, H1, W1, C = fmap1.shape
        _, H2, W2, _ = fmap2.shape
        strips1_r = make_strips(_pad_ring(fmap1, pad))
        strips2_r = make_strips(_pad_ring(fmap2, pad))
    NX1, HT1 = strips1_r.shape[1], strips1_r.shape[2]
    NX2, HT2 = strips2_r.shape[1], strips2_r.shape[2]
    L = slotmap.shape[0]

    tabs, gidx, gslot, NTB = _cell_tables_a(
        NI, T, M, PP, r, n, slotmap, MEM, L, tb)
    Tp = NTB * tb
    NB = NTGT * NTB

    if planar:
        tyA, txA, vA = _prep_pack_planar(
            u1, v1_, uc1, vc1, H1, W1, R, D, pad)
        tyB, txB, vB = _prep_pack_planar(
            u1 / 4.0, v1_ / 4.0, uc1 / 4.0, vc1 / 4.0, H2, W2, R, D, pad,
            spread=SPREAD2_S, tyl=TY2S)
    else:
        cflat = coords.reshape(E, P, P, 2)
        prep1 = _level_prep(cflat, H1, W1, P, R, D, pad)
        prep2 = _level_prep(cflat / 4.0, H2, W2, P, R, D, pad,
                            spread=SPREAD2_S, tyl=TY2S)
        ty1, tx1, vA = _pack_window_scalars(prep1, E, PP)
        ty2, tx2, vB = _pack_window_scalars(prep2, E, PP)
        tyA = ty1.reshape(NI * T, M)
        txA = tx1.reshape(NI * T, M)
        tyB = ty2.reshape(NI * T, M)
        txB = tx2.reshape(NI * T, M)
        vA = vA.reshape(NI * T, M * PP)
        vB = vB.reshape(NI * T, M * PP)

    # lattice (row, t) -> target-major (a, t) table gather (tiny arrays).
    # scal rides SMEM with the 5 scalar columns on the SUBLANE axis: SMEM
    # windows pad each sublane-row to ~1 KB, so a (tb*M, 5) block would
    # allocate tb*M KB (measured 1.28 MB > the 1 MB SMEM budget).
    gflat_idx = gidx.reshape(NTGT * Tp)
    scal = jnp.stack(
        [tyA[gflat_idx], txA[gflat_idx] // 8,
         tyB[gflat_idx], txB[gflat_idx] // 8,
         jnp.broadcast_to(gslot.reshape(-1)[:, None], (NTGT * Tp, M))],
        axis=0,
    ).astype(jnp.int32).reshape(
        5, NTGT, NTB, tb * M
    ).transpose(1, 2, 0, 3)
    vcol = jnp.stack(
        [vA[gflat_idx], vB[gflat_idx]], axis=-1
    ).reshape(NTGT, NTB, tb * M * PP, 2)

    gmap_flat = gmap_r.reshape(MEM, M * PP, C)
    consts = jnp.asarray(_s4_consts(D))

    g_spec = pl.BlockSpec((MEM, M * PP, C), lambda b, tb_: (0, 0, 0))
    scal_spec = pl.BlockSpec(
        (1, 1, 5, tb * M), lambda b, tb_: (tb_[b, 0], tb_[b, 1], 0, 0),
        memory_space=pltpu.SMEM,
    )
    vcol_spec = pl.BlockSpec(
        (1, 1, tb * M * PP, 2), lambda b, tb_: (tb_[b, 0], tb_[b, 1], 0, 0)
    )
    out_spec = pl.BlockSpec(
        (1, 1, tb * M * PP, 128), lambda b, tb_: (tb_[b, 3], tb_[b, 1], 0, 0)
    )
    if "pinslot" in ablate:
        tabs = tabs.at[:, 2].set(0)
    if "pinout" in ablate:
        tabs = tabs.at[:, 3].set(NTGT)

    if "nobar" not in ablate:
        # see the corr_lattice_fused2 barrier note (operand-copy fusion tax)
        tabs, scal, vcol = jax.lax.optimization_barrier((tabs, scal, vcol))

    out = pl.pallas_call(
        functools.partial(_kernel_lat_fused4, C=C, PP=PP, D=D, M=M, NI=NI,
                          gang=gang, ablate=tuple(ablate)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NB,),
            in_specs=[
                pl.BlockSpec(
                    (1, NX1, HT1, C), lambda b, tb_: (tb_[b, 2], 0, 0, 0)
                ),
                pl.BlockSpec(
                    (1, NX2, HT2, C), lambda b, tb_: (tb_[b, 2], 0, 0, 0)
                ),
                g_spec,
                scal_spec,
                vcol_spec,
                pl.BlockSpec((D * TX, 256), lambda b, tb_: (0, 0)),
            ],
            out_specs=out_spec,
            scratch_shapes=[],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (NTGT + 1, NTB, tb * M * PP, 128), jnp.bfloat16
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(tabs, strips1_r, strips2_r, gmap_flat, scal, vcol, consts)

    # target-major -> lattice order: ONE row gather (fused with the vmask
    # kill; replaces fused3's plain `where` pass over the same bytes)
    i_row = jnp.arange(NI, dtype=jnp.int32)[:, None]
    tt = jnp.arange(T, dtype=jnp.int32)[None, :]
    i_host = n - 1 - jnp.mod(n - 1 - i_row, NI) + 0 * tt
    a_of = i_host + tt - (r - 1) - (n - NTGT)
    src = jnp.where(
        (a_of >= 0) & (a_of < NTGT), a_of, NTGT
    ) * Tp + tt                                        # [NI, T]
    out_rows = out.reshape((NTGT + 1) * Tp, M * PP * 128)[src.reshape(-1)]
    vmask = _cell_vmask(NI, T, M, r, n, cell_valid)
    return jnp.where(
        vmask[:, None],
        out_rows.reshape(E, PP * 128),
        jnp.bfloat16(0.0),
    )


# ---------------------------------------------------------------------------
# training correlation: static-schedule fused kernel + custom VJP
# ---------------------------------------------------------------------------

def make_corr_train_sched(jj, n_slots: int, E_BLK: int = 64):
    """Static launch tables for `corr_train_fused` from a STATIC edge list.

    The training edge schedule (train/forward.py::edge_schedule) is known at
    trace time, so the sort-by-target and per-block slot tables are plain
    numpy — zero in-graph sort cost (the inference lattice gets the same
    property from the lattice structure itself).

    jj: [E] numpy target-frame index per edge. Returns dict with
    src [E_pad] (padded-row -> edge index, pads replicate edge 0 of the
    group), inv [E] (edge -> padded row), tabs [NB] (per-block fmap slot).
    """
    jj = np.asarray(jj)
    E = jj.shape[0]
    order = np.argsort(jj, kind="stable")
    src_rows = []
    tabs = []
    for s in range(n_slots):
        idx = order[jj[order] == s]
        if len(idx) == 0:
            continue
        padded = len(idx) + (-len(idx)) % E_BLK
        src = np.empty(padded, np.int64)
        src[: len(idx)] = idx
        src[len(idx):] = idx[0]          # pads: any edge of the same slot
        src_rows.append(src)
        tabs += [s] * (padded // E_BLK)
    src = np.concatenate(src_rows)
    E_pad = len(src)
    inv = np.zeros(E, np.int64)
    first = np.full(E, -1, np.int64)
    for row, e in enumerate(src):        # first occurrence wins
        if first[e] < 0:
            first[e] = row
    inv = first
    assert (inv >= 0).all()
    return {
        "src": jnp.asarray(src, jnp.int32),
        "inv": jnp.asarray(inv, jnp.int32),
        "tabs": jnp.asarray(np.asarray(tabs, np.int32)),
        "E_BLK": E_BLK,
    }


def _kernel_sched_fused2(tabs, strips1, strips2, g_ref, scal_ref,
                         vcol_ref, consts_ref, out_ref, *, C, PP, D, E_BLK):
    """Training-forward corr kernel, modernized to the fused3 design
    (r05): strip-major slot blocks (Pallas-pipelined, no manual DMA or
    tile-relayout staging), in-register gang assembly (no rs/vi scratch
    roundtrips or per-window scalar stores), the S4 blend-folded
    extraction matmul, narrow rolls, and one whole-block gang
    ([E_BLK*PP, W] chains). One grid step = E_BLK same-target edges of
    the STATIC sorted schedule; no validity gating (pads replicate real
    edges and are dropped by the caller's inverse permutation).

    Tile geometry is IDENTICAL to the v1 kernel (TY=16/SPREAD=4 at both
    levels) so `corr_sched_bwd` — the custom-VJP backward — matches
    unchanged. Ref semantics: altcorr/correlation_kernel.cu:83-136."""
    b = pl.program_id(0)
    S4 = consts_ref[...]                               # [D*TX, 256]
    gang = E_BLK

    g_gang = g_ref[0, :, :]                            # [E_BLK*PP, C]
    dms = ([], [])
    for u in range(gang):
        g_u = g_gang[u * PP:(u + 1) * PP, :]           # [PP, C]
        for lvl, strips in ((0, strips1), (1, strips2)):
            tile = strips[
                0,
                scal_ref[0, 0, 2 * lvl + 1, u],
                pl.ds(
                    pl.multiple_of(scal_ref[0, 0, 2 * lvl, u] * TX, 8),
                    TY * TX,
                ),
                :,
            ]                                          # [TY*TX, C]
            dms[lvl].append(jax.lax.dot_general(
                g_u, tile,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))

    outs = []
    nbits = _nbits(TY)
    for lvl in (0, 1):
        r_ = jnp.concatenate(dms[lvl], axis=0)         # [gang*PP, 384]
        W_roll = r_.shape[-1]
        v_ = vcol_ref[0, :, pl.ds(lvl, 1)]             # [gang*PP, 1]
        off = v_ & 255
        for bit in range(6, nbits):
            rolled = pltpu.roll(r_, W_roll - (1 << bit), 1)
            r_ = jnp.where(((off >> bit) & 1) == 1, rolled, r_)
        r_ = r_[:, :256]
        W_roll = 256
        for bit in range(6):
            rolled = pltpu.roll(r_, W_roll - (1 << bit), 1)
            r_ = jnp.where(((off >> bit) & 1) == 1, rolled, r_)
        c4 = jax.lax.dot_general(
            r_[:, : D * TX], S4,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [gang*PP, 256] = [c00 | c01 | c10 | c11]
        fx = ((v_ >> 8) & 1023).astype(jnp.float32) * (1.0 / 1024.0)
        fy = ((v_ >> 18) & 1023).astype(jnp.float32) * (1.0 / 1024.0)
        okm = ((v_ >> 28) & 1).astype(jnp.float32)
        outs.append(okm * (
            (1 - fy) * (1 - fx) * c4[:, 0:64]
            + (1 - fy) * fx * c4[:, 64:128]
            + fy * (1 - fx) * c4[:, 128:192]
            + fy * fx * c4[:, 192:256]
        ))

    pair = jnp.concatenate(outs, axis=1)               # [gang*PP, 128]
    out_ref[0, :, :] = pair.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("radius", "E_BLK", "interpret")
)
def corr_sched_fused(gmap, fmap1, fmap2, coords, kk, src, inv, tabs,
                     radius: int = 3, E_BLK: int = 64,
                     interpret: bool = False):
    """Training correlation forward, both pyramid levels in one fused
    Pallas pass.

    Runs `_kernel_sched_fused2` (r05 modernization — strip-major
    pipelined slot blocks, in-register assembly, S4 blend-fold, narrow
    rolls, whole-block gang; 2.17 -> 2.08 s/train-step vs the staged v1
    ancestor, which is removed).

    gmap [Mg, P, P, C]; fmap1 [Nf, H, W, C]; fmap2 [Nf, H//4, W//4, C];
    coords [E, P, P, 2] level-1 resolution; kk [E] gmap rows; src/inv/tabs
    from `make_corr_train_sched`. Returns [E, PP*128] bf16 in the PAIRED
    layout (paired_corr_perm): lane q*128 + l*64 + y*8 + x."""
    E, P = coords.shape[0], coords.shape[1]
    Nf, H1, W1, C = fmap1.shape
    _, H2, W2, _ = fmap2.shape
    R = radius
    D = 2 * R + 2
    PP = P * P
    pad = 3 * D
    NB = tabs.shape[0]
    E_pad = NB * E_BLK
    assert E_BLK % GANG == 0 and D == 8

    cs = jnp.take(coords, src, axis=0).reshape(E_pad, P, P, 2)
    g_s = jnp.take(
        gmap.reshape(-1, PP, C), jnp.take(kk, src, axis=0), axis=0
    ).astype(jnp.bfloat16)

    prep1 = _level_prep(cs, H1, W1, P, R, D, pad)
    prep2 = _level_prep(cs / 4.0, H2, W2, P, R, D, pad)
    ty1, tx1, v1_ = _pack_window_scalars(prep1, E_pad, PP)
    ty2, tx2, v2_ = _pack_window_scalars(prep2, E_pad, PP)

    fpad1 = _pad_ring(fmap1.astype(jnp.bfloat16), pad)
    fpad2 = _pad_ring(fmap2.astype(jnp.bfloat16), pad)
    Hp1, Wp1 = fpad1.shape[1], fpad1.shape[2]
    Hp2, Wp2 = fpad2.shape[1], fpad2.shape[2]

    strips1 = make_strips(fpad1)
    strips2 = make_strips(fpad2)
    NX1, HT1 = strips1.shape[1], strips1.shape[2]
    NX2, HT2 = strips2.shape[1], strips2.shape[2]
    scal = jnp.stack(
        [ty1, tx1 // 8, ty2, tx2 // 8], axis=0
    ).astype(jnp.int32).T.reshape(NB, E_BLK, 4).transpose(
        0, 2, 1
    ).reshape(NB, 1, 4, E_BLK)
    vcol = jnp.stack([v1_, v2_], axis=-1).reshape(
        NB, E_BLK * PP, 2
    )
    consts = jnp.asarray(_s4_consts(D))

    scal, vcol = jax.lax.optimization_barrier((scal, vcol))
    out = pl.pallas_call(
        functools.partial(
            _kernel_sched_fused2, C=C, PP=PP, D=D, E_BLK=E_BLK
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NB,),
            in_specs=[
                pl.BlockSpec(
                    (1, NX1, HT1, C), lambda b, tb: (tb[b], 0, 0, 0)
                ),
                pl.BlockSpec(
                    (1, NX2, HT2, C), lambda b, tb: (tb[b], 0, 0, 0)
                ),
                pl.BlockSpec(
                    (1, E_BLK * PP, C), lambda b, tb: (b, 0, 0)
                ),
                pl.BlockSpec(
                    (1, 1, 4, E_BLK), lambda b, tb: (b, 0, 0, 0),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec(
                    (1, E_BLK * PP, 2), lambda b, tb: (b, 0, 0)
                ),
                pl.BlockSpec((D * TX, 256), lambda b, tb: (0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, E_BLK * PP, 128), lambda b, tb: (b, 0, 0)
            ),
            scratch_shapes=[],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (NB, E_BLK * PP, 128), jnp.bfloat16
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(tabs, strips1, strips2, g_s.reshape(NB, E_BLK * PP, C),
      scal, vcol, consts)
    return jnp.take(out.reshape(E_pad, PP * 128), inv, axis=0)


def _kernel_sched_bwd(tabs, fmap1_hbm, fmap2_hbm, g_ref, scal_ref, ct_ref,
                      gg_ref, gf1_ref, gf2_ref,
                      scratch1, scratch2, tile_scratch, gv0, gv1, vi0, vi1,
                      last_slot, sem1, sem2, *, C, PP, D, E_BLK):
    """Backward of `_kernel_sched_fused`: same grid/schedule; per gang it
    rebuilds each edge-level's raw-tile gradient gv by transposing the
    in-kernel blend (3 lane rolls), compaction (S^T matmul) and binary-roll
    alignment, then

      grad_gmap[e]  = gv_e [PP, TY*TX] @ tile_e [TY*TX, C]
      grad_fmap    += gv_e^T-contracted with g_e into the fmap-grad OUTPUT
                      block at the tile offset (Pallas output revisiting
                      keeps the per-slot accumulator in VMEM; the block is
                      zeroed on slot entry and written back on slot change)

    Output gradients for slots absent from the schedule are uninitialized;
    the caller masks them with the (static) touched-slot set."""
    b = pl.program_id(0)
    slot = tabs[b]

    @pl.when(b == 0)
    def _init():
        last_slot[0] = -1

    @pl.when(slot != last_slot[0])
    def _load():
        cp1 = pltpu.make_async_copy(fmap1_hbm.at[slot], scratch1, sem1)
        cp2 = pltpu.make_async_copy(fmap2_hbm.at[slot], scratch2, sem2)
        cp1.start()
        cp2.start()
        cp1.wait()
        cp2.wait()
        last_slot[0] = slot
        # fresh slot: zero the fmap-grad accumulator blocks
        gf1_ref[...] = jnp.zeros_like(gf1_ref)
        gf2_ref[...] = jnp.zeros_like(gf2_ref)

    rowid = jax.lax.broadcasted_iota(jnp.int32, (D * TX, 64), 0)
    outid = jax.lax.broadcasted_iota(jnp.int32, (D * TX, 64), 1)
    S = (
        (rowid // TX == outid // 8) & (rowid % TX == outid % 8)
    ).astype(jnp.bfloat16)
    lane = jax.lax.broadcasted_iota(jnp.int32, (GANG * PP, 64), 1)
    good = (((lane // 8) < D - 1) & ((lane % 8) < D - 1)).astype(
        jnp.float32
    )

    def edge_gang(i, carry):
        for u in range(GANG):
            e = i * GANG + u
            for lvl, scratch in ((0, scratch1), (1, scratch2)):
                tile = scratch[
                    pl.ds(scal_ref[0, e, 2 * lvl], TY),
                    pl.ds(
                        pl.multiple_of(scal_ref[0, e, 2 * lvl + 1], 8), TX
                    ),
                    :,
                ]
                row = (u * 2 + lvl) * TY * TX
                tile_scratch[pl.ds(row, TY * TX), :] = tile.reshape(
                    TY * TX, C
                )
            for lvl, vi in ((0, vi0), (1, vi1)):
                for q in range(PP):
                    v = scal_ref[0, e, 4 + lvl * PP + q]
                    vi[pl.ds(u * PP + q, 1), :] = jnp.full(
                        (1, 1), v, jnp.int32
                    )

        ct_gang = ct_ref[0, pl.ds(i * GANG, GANG)].astype(
            jnp.float32
        ).reshape(GANG * PP, 128)

        for lvl, gv, vi in ((0, gv0, vi0), (1, gv1, vi1)):
            v_ = vi[...]
            fx = ((v_ >> 8) & 1023).astype(jnp.float32) * (1.0 / 1024.0)
            fy = ((v_ >> 18) & 1023).astype(jnp.float32) * (1.0 / 1024.0)
            okm = ((v_ >> 28) & 1).astype(jnp.float32)
            g1 = ct_gang[:, lvl * 64:(lvl + 1) * 64] * good
            # transpose of the bilinear blend (forward: right-rolls by
            # 63/56/55 == left 1/8/9): right-rolls by 1/8/9
            cg = okm * (
                (1 - fy) * (1 - fx) * g1
                + (1 - fy) * fx * pltpu.roll(g1, 1, 1)
                + fy * (1 - fx) * pltpu.roll(g1, 8, 1)
                + fy * fx * pltpu.roll(g1, 9, 1)
            )
            # transpose of the compaction: [*, 64] @ S^T -> [*, D*TX]
            dr = jax.lax.dot_general(
                cg.astype(jnp.bfloat16), S,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [GANG*PP, D*TX]
            r_ = jnp.concatenate(
                [dr, jnp.zeros((GANG * PP, (TY - D) * TX), jnp.float32)],
                axis=1,
            )
            # transpose of the left-roll alignment: roll RIGHT by off
            off = v_ & 255
            for bit in range(8):
                rolled = pltpu.roll(r_, 1 << bit, 1)
                r_ = jnp.where(((off >> bit) & 1) == 1, rolled, r_)
            gv[...] = r_.astype(gv.dtype)

        g_gang = g_ref[0, pl.ds(i * GANG * PP, GANG * PP), :]
        for u in range(GANG):
            e = i * GANG + u
            gacc = jnp.zeros((PP, C), jnp.float32)
            for lvl, gv, gf in ((0, gv0, gf1_ref), (1, gv1, gf2_ref)):
                gv_e = gv[u * PP:(u + 1) * PP, :]        # [PP, TY*TX]
                tile_e = tile_scratch[
                    (u * 2 + lvl) * TY * TX:(u * 2 + lvl + 1) * TY * TX, :
                ]
                gacc = gacc + jax.lax.dot_general(
                    gv_e, tile_e,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                # fmap-grad contribution: [TY*TX, C] at the tile offset
                g_e = g_gang[u * PP:(u + 1) * PP, :]
                contrib = jax.lax.dot_general(
                    gv_e, g_e,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).reshape(TY, TX, C)
                ty = scal_ref[0, e, 2 * lvl]
                tx = pl.multiple_of(scal_ref[0, e, 2 * lvl + 1], 8)
                cur = gf[0, pl.ds(ty, TY), pl.ds(tx, TX), :]
                gf[0, pl.ds(ty, TY), pl.ds(tx, TX), :] = (
                    cur + contrib.astype(gf.dtype)
                )
            gg_ref[0, e] = gacc.astype(gg_ref.dtype)
        return carry

    jax.lax.fori_loop(0, E_BLK // GANG, edge_gang, 0)


def corr_sched_bwd(ct_pad, gmap_s, fmap1, fmap2, coords_s, tabs,
                   radius: int = 3, E_BLK: int = 64,
                   interpret: bool = False):
    """Pallas backward for the fused training correlation.

    ct_pad [E_pad, PP*128] cotangent in SORTED order (pads zero);
    gmap_s [E_pad, PP, C] sorted per-edge gmap rows; coords_s [E_pad, P,
    P, 2] sorted level-1 coords; tabs [NB] per-block fmap slot. Returns
    (grad_gmap_s [E_pad, PP, C] f32, grad_fmap1, grad_fmap2) — fmap grads
    at the UNPADDED fmap shapes, f32."""
    E_pad = ct_pad.shape[0]
    Nf, H1, W1, C = fmap1.shape
    _, H2, W2, _ = fmap2.shape
    P = coords_s.shape[1]
    R = radius
    D = 2 * R + 2
    PP = P * P
    pad = 3 * D
    NB = tabs.shape[0]
    assert E_pad == NB * E_BLK

    prep1 = _level_prep(coords_s, H1, W1, P, R, D, pad)
    prep2 = _level_prep(coords_s / 4.0, H2, W2, P, R, D, pad)
    ty1, tx1, v1 = _pack_window_scalars(prep1, E_pad, PP)
    ty2, tx2, v2 = _pack_window_scalars(prep2, E_pad, PP)
    scal = jnp.concatenate(
        [ty1[:, None], tx1[:, None], ty2[:, None], tx2[:, None], v1, v2],
        axis=1,
    ).astype(jnp.int32).reshape(NB, E_BLK, 4 + 2 * PP)

    fpad1 = _pad_ring(fmap1.astype(jnp.bfloat16), pad)
    fpad2 = _pad_ring(fmap2.astype(jnp.bfloat16), pad)
    Hp1, Wp1 = fpad1.shape[1], fpad1.shape[2]
    Hp2, Wp2 = fpad2.shape[1], fpad2.shape[2]

    # see the corr_lattice_fused2 barrier note (operand-copy fusion tax)
    scal = jax.lax.optimization_barrier(scal)

    gg, gf1, gf2 = pl.pallas_call(
        functools.partial(
            _kernel_sched_bwd, C=C, PP=PP, D=D, E_BLK=E_BLK
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NB,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(
                    (1, E_BLK * PP, C), lambda b, tb: (b, 0, 0)
                ),
                pl.BlockSpec(
                    (1, E_BLK, 4 + 2 * PP), lambda b, tb: (b, 0, 0),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec(
                    (1, E_BLK, PP * 128), lambda b, tb: (b, 0, 0)
                ),
            ],
            out_specs=[
                pl.BlockSpec((1, E_BLK, PP, C), lambda b, tb: (b, 0, 0, 0)),
                # per-slot accumulators: same index while the slot repeats
                pl.BlockSpec(
                    (1, Hp1, Wp1, C), lambda b, tb: (tb[b], 0, 0, 0)
                ),
                pl.BlockSpec(
                    (1, Hp2, Wp2, C), lambda b, tb: (tb[b], 0, 0, 0)
                ),
            ],
            scratch_shapes=[
                pltpu.VMEM((Hp1, Wp1, C), jnp.bfloat16),
                pltpu.VMEM((Hp2, Wp2, C), jnp.bfloat16),
                pltpu.VMEM((GANG * 2 * TY * TX, C), jnp.bfloat16),
                pltpu.VMEM((GANG * PP, TY * TX), jnp.bfloat16),
                pltpu.VMEM((GANG * PP, TY * TX), jnp.bfloat16),
                pltpu.VMEM((GANG * PP, 1), jnp.int32),
                pltpu.VMEM((GANG * PP, 1), jnp.int32),
                pltpu.SMEM((1,), jnp.int32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((NB, E_BLK, PP, C), jnp.float32),
            jax.ShapeDtypeStruct((Nf, Hp1, Wp1, C), jnp.float32),
            jax.ShapeDtypeStruct((Nf, Hp2, Wp2, C), jnp.float32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024
        ),
        interpret=interpret,
    )(tabs, fpad1, fpad2,
      gmap_s.reshape(NB, E_BLK * PP, C).astype(jnp.bfloat16),
      scal, ct_pad.reshape(NB, E_BLK, PP * 128))

    # slots never visited by the schedule hold uninitialized output memory
    touched = jnp.zeros((Nf,), bool).at[tabs].set(True)
    gf1 = jnp.where(touched[:, None, None, None], gf1, 0.0)
    gf2 = jnp.where(touched[:, None, None, None], gf2, 0.0)
    grad_f1 = gf1[:, pad:pad + H1, pad:pad + W1]
    grad_f2 = gf2[:, pad:pad + H2, pad:pad + W2]
    return gg.reshape(E_pad, PP, C), grad_f1, grad_f2


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def corr_train_fused(gmap, fmap1, fmap2, coords, kk, jj, sched_src_inv,
                     tabs, radius=3, E_BLK=64, interpret=False):
    """Differentiable two-level training correlation, Pallas forward.

    Forward: `corr_sched_fused` (one fused kernel pass for both pyramid
    levels, PAIRED output layout). Backward: `corr_sched_bwd`, the Pallas
    mirror of the forward over the same schedule — gradients flow to
    gmap/fmap only, coords dropped, matching the reference backward
    (altcorr/correlation.py:32-45). The SPREAD window clip of the forward
    is mirrored in the backward (`ok` masking) so fwd/bwd stay consistent.
    """
    src, inv = sched_src_inv
    return corr_sched_fused(
        gmap, fmap1, fmap2, coords, kk, src, inv, tabs,
        radius=radius, E_BLK=E_BLK, interpret=interpret,
    )


def _ctf_fwd(gmap, fmap1, fmap2, coords, kk, jj, sched_src_inv, tabs,
             radius, E_BLK, interpret):
    out = corr_train_fused(
        gmap, fmap1, fmap2, coords, kk, jj, sched_src_inv, tabs,
        radius, E_BLK, interpret,
    )
    return out, (gmap, fmap1, fmap2, coords, kk, jj, sched_src_inv, tabs)


def _ctf_bwd(radius, E_BLK, interpret, res, ct):
    gmap, fmap1, fmap2, coords, kk, jj, (src, inv), tabs = res
    E, P = coords.shape[0], coords.shape[1]
    PP = P * P
    gmap_f = gmap.reshape(-1, P, P, gmap.shape[-1])
    C = gmap_f.shape[-1]
    E_pad = src.shape[0]

    # expand the cotangent to the padded sorted order (pads get zero — the
    # forward's take(inv) reads only first-occurrence rows)
    ct_pad = jnp.zeros((E_pad, ct.shape[1]), ct.dtype).at[inv].set(ct)
    kk_s = jnp.take(kk, src, axis=0)
    gmap_s = jnp.take(gmap_f.reshape(-1, PP, C), kk_s, axis=0)
    coords_s = jnp.take(coords, src, axis=0)

    gg_s, grad_f1, grad_f2 = corr_sched_bwd(
        ct_pad, gmap_s, fmap1, fmap2, coords_s, tabs,
        radius=radius, E_BLK=E_BLK, interpret=interpret,
    )
    grad_g = jax.ops.segment_sum(
        gg_s, kk_s, num_segments=gmap_f.shape[0]
    )

    ct_int = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return (
        grad_g.reshape(gmap.shape).astype(gmap.dtype),
        grad_f1.astype(fmap1.dtype), grad_f2.astype(fmap2.dtype),
        jnp.zeros_like(coords),
        ct_int(kk), ct_int(jj),
        (ct_int(src), ct_int(inv)),
        ct_int(tabs),
    )


corr_train_fused.defvjp(_ctf_fwd, _ctf_bwd)


@functools.lru_cache(maxsize=4)
def paired_corr_perm(P: int = 3, R: int = 3):
    """ref_col (or -1) for each PAIRED-layout column (corr_lattice_fused2).

    Paired column q*128 + l*64 + y*8 + x holds blend_l[q, y, x] for
    y, x < 2R+1 (garbage otherwise); reference column
    ((py*P+px)*d*d + a*d + b)*2 + l holds blend_l[py, px, y=b, x=a].
    A consumer with a Dense kernel W [P*P*d*d*2, Dout] for the reference
    layout uses W_paired[c] = W[idx[c]] with zero rows where idx == -1."""
    d = 2 * R + 1
    PP = P * P
    idx = np.full(PP * 128, -1, np.int32)
    for q in range(PP):
        for l in range(2):
            for y in range(d):
                for x in range(d):
                    idx[q * 128 + l * 64 + y * 8 + x] = (
                        (q * d * d + x * d + y) * 2 + l
                    )
    return idx


@functools.lru_cache(maxsize=4)
def folded_corr_perm(P: int = 3, R: int = 3):
    """ref_col -> folded_col map for `corr_lattice2_stacked(folded=True)`.

    Reference column ((py*P+px)*d*d + a*d + b)*2 + l holds
    blend_l[py, px, y=b, x=a]; folded column l*(P*P*d*d) + (py*P+px)*d*d +
    y*d + x holds blend_l[py, px, y, x]. A consumer with Dense kernel W
    [882, Dout] for the reference layout uses W_folded[perm] = W, i.e.
    `W_folded = W[inv]` with inv[folded_col] = ref_col (returned here)."""
    d = 2 * R + 1
    PP = P * P
    inv = np.zeros(PP * d * d * 2, np.int32)
    for q in range(PP):
        for a in range(d):
            for b in range(d):
                for l in range(2):
                    ref_col = (q * d * d + a * d + b) * 2 + l
                    folded_col = l * PP * d * d + q * d * d + b * d + a
                    inv[folded_col] = ref_col
    return inv
