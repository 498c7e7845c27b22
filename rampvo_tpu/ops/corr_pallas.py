"""Pallas TPU correlation kernel.

The XLA formulations of `ops.corr` are bounded by the TPU's scattered-gather
rate (~50-80 GB/s measured): every (edge, patch-pixel) window re-reads HBM.
This kernel removes HBM gathers entirely:

  * edges are grouped by target ring slot; a slot's zero-padded feature map
    is DMA'd into a VMEM scratch once per contiguous group (~8MB at 1/4
    res - one pass over the feature rings per call),
  * per edge, ONE [TY, TX, C] bounding tile around the patch center is
    sliced from VMEM and correlated with all P^2 patch-pixel features in a
    single MXU matmul ([TY*TX, C] x [C, P^2]),
  * each pixel's (2R+2)^2 window is then cut from the dot-map in-kernel
    (row offsets land on the alignment-free major dim; columns use an
    8-aligned 16-wide band), leaving only a small x-remainder one-hot
    einsum + bilinear blend outside.

Exploits the same structure as ops.corr_tiled: patch inverse depth is
constant across a patch (ramp/utils.py:99-101), so its 9 reprojected pixels
stay within a few px of the center. A pixel farther than `SPREAD` px gets a
zeroed window (treated as out-of-bounds - geometry the BA robust gates
discard anyway, ba_cuda.cu:296-308). Otherwise semantics match
altcorr/correlation_kernel.cu:83-136,221-232 exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

E_BLK = 128
SPREAD = 4            # max |patch pixel - center| handled exactly (px)
TY = 16               # tile rows: D + 2*SPREAD
TX = 32               # tile cols: D + 2*SPREAD + 8-alignment slack
BAND = 16             # aligned x-band written per window


def _kernel(slot_of_block, fmap_hbm, g_ref, ty_ref, tx_ref, oy_ref, xb_ref,
            out_ref, scratch, dm_scratch, sem, *, C, PP, D):
    b = pl.program_id(0)
    slot = slot_of_block[b]
    prev = slot_of_block[jnp.maximum(b - 1, 0)]
    need = jnp.logical_or(b == 0, slot != prev)

    @pl.when(need)
    def _load():
        cp = pltpu.make_async_copy(fmap_hbm.at[slot], scratch, sem)
        cp.start()
        cp.wait()

    UNROLL = 4

    def edge_group(i, carry):
        for u in range(UNROLL):  # amortize loop/addressing overhead
            e = i * UNROLL + u
            tile = scratch[
                pl.ds(ty_ref[0, e, 0], TY),
                pl.ds(pl.multiple_of(tx_ref[0, e, 0], 8), TX), :
            ]
            dm = jnp.dot(
                tile.reshape(TY * TX, C),
                g_ref[e],
                preferred_element_type=jnp.float32,
            )  # [TY*TX, PP]
            dm_scratch[...] = dm.reshape(TY, TX, PP)
            for q in range(PP):  # unrolled
                band = dm_scratch[
                    pl.ds(oy_ref[0, e, q], D),
                    pl.ds(pl.multiple_of(xb_ref[0, e, q], 8), BAND), q
                ]
                out_ref[e, q] = band.astype(out_ref.dtype)  # [D, BAND]
        return carry

    jax.lax.fori_loop(0, E_BLK // UNROLL, edge_group, 0)


@functools.partial(jax.jit, static_argnames=("radius", "interpret"))
def corr_pallas(
    gmap: jnp.ndarray,     # [Mg, P, P, C]
    fmap: jnp.ndarray,     # [MEM, H, W, C]
    coords: jnp.ndarray,   # [E, P, P, 2]
    ii: jnp.ndarray,       # [E] gmap rows
    jj: jnp.ndarray,       # [E] ring slots
    radius: int = 3,
    interpret: bool = False,
) -> jnp.ndarray:
    E, P, _, _ = coords.shape
    MEM, H, W, C = fmap.shape
    R = radius
    D = 2 * R + 2
    PP = P * P
    assert TY >= D + 2 * SPREAD and TX >= D + 2 * SPREAD + 7
    pad = 3 * D  # generous: tiles of clamped centers stay inside the pad

    # ---- group edges by slot, pad groups to E_BLK multiples ----
    jj = jnp.clip(jj, 0, MEM - 1).astype(jnp.int32)
    order = jnp.argsort(jj)
    jj_s = jj[order]
    counts = jax.ops.segment_sum(jnp.ones_like(jj), jj, num_segments=MEM)
    group_start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1].astype(jnp.int32)]
    )
    rank = jnp.arange(E, dtype=jnp.int32) - group_start[jj_s]
    padded_counts = ((counts + E_BLK - 1) // E_BLK) * E_BLK
    padded_start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32),
         jnp.cumsum(padded_counts)[:-1].astype(jnp.int32)]
    )
    pos = padded_start[jj_s] + rank

    E_pad = int(np.ceil(E / E_BLK) * E_BLK) + MEM * E_BLK
    NB = E_pad // E_BLK
    blk_slot = (
        jnp.searchsorted(
            padded_start, jnp.arange(NB, dtype=jnp.int32) * E_BLK, side="right"
        ).astype(jnp.int32) - 1
    )
    blk_slot = jnp.clip(blk_slot, 0, MEM - 1)

    # ---- window starts (padded coords) + per-edge tile bases ----
    x = coords[..., 0]
    y = coords[..., 1]
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    sy = jnp.clip(y0, -D, H + D) - R + pad
    sx = jnp.clip(x0, -D, W + D) - R + pad

    ty = sy[:, P // 2, P // 2] - SPREAD                   # tile row base
    tx = ((sx[:, P // 2, P // 2] - SPREAD) // 8) * 8      # aligned col base

    oy = sy - ty[:, None, None]          # window row offset inside the tile
    ox = sx - tx[:, None, None]          # window col offset inside the tile
    ok = (oy >= 0) & (oy <= TY - D) & (ox >= 0) & (ox <= TX - D)
    oy = jnp.clip(oy, 0, TY - D)
    ox = jnp.clip(ox, 0, TX - D)
    xb = jnp.clip((ox // 8) * 8, 0, TX - BAND)  # aligned 16-band per window
    rem = ox - xb                               # in [0, 8)

    g = jnp.swapaxes(jnp.take(gmap, ii, axis=0).reshape(E, PP, C), 1, 2)

    def pad_scatter(arr):
        out = jnp.zeros((E_pad,) + arr.shape[1:], arr.dtype)
        return out.at[pos].set(arr[order])

    g_p = pad_scatter(g)
    ty_p = pad_scatter(ty).reshape(NB, E_BLK, 1)
    tx_p = pad_scatter(tx).reshape(NB, E_BLK, 1)
    oy_p = pad_scatter(oy.reshape(E, PP)).reshape(NB, E_BLK, PP)
    xb_p = pad_scatter(xb.reshape(E, PP)).reshape(NB, E_BLK, PP)

    fpad = jnp.pad(fmap, ((0, 0), (pad, pad), (pad, pad + 16), (0, 0)))
    Hp, Wp = H + 2 * pad, W + 2 * pad + 16

    band_p = pl.pallas_call(
        functools.partial(_kernel, C=C, PP=PP, D=D),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NB,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((E_BLK, C, PP), lambda b, sob: (b, 0, 0)),
                pl.BlockSpec((1, E_BLK, 1), lambda b, sob: (b, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, E_BLK, 1), lambda b, sob: (b, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, E_BLK, PP), lambda b, sob: (b, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, E_BLK, PP), lambda b, sob: (b, 0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (E_BLK, PP, D, BAND), lambda b, sob: (b, 0, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((Hp, Wp, C), fmap.dtype),
                pltpu.VMEM((TY, TX, PP), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (E_pad, PP, D, BAND), jnp.bfloat16
        ),  # the reference's inference corr is fp16 (Ramp_vo.py autocast)
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(blk_slot, fpad, g_p, ty_p, tx_p, oy_p, xb_p)

    # single-gather unsort: row for original edge i lives at pos[argsort(order)][i]
    band = band_p[pos[jnp.argsort(order)]].astype(jnp.float32)

    # x-remainder extraction: one-hot over the 16-band -> D columns
    sel = (
        rem.reshape(E, PP)[:, :, None, None]
        + jnp.arange(D)[None, None, :, None]
        == jnp.arange(BAND)[None, None, None, :]
    ).astype(band.dtype)  # [E, PP, D(out), BAND(src)]
    vol = jnp.einsum("eqbx,eqax->eqab", sel, band).reshape(E, P, P, D, D)
    vol = vol * ok.reshape(E, P, P)[..., None, None].astype(vol.dtype)

    # bilinear blend + reference window-order transpose
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
