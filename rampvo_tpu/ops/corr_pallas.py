"""Pallas TPU correlation kernel.

Replaces the XLA gather formulation of `ops.corr` for the hot path. The XLA
version issues one HBM gather per (edge, patch-pixel) window (~0.5M
descriptors, ~8.8GB of touched bytes per level); this kernel exploits the
massive reuse the reference's CUDA kernel gets from the GPU L2: edges are
grouped by their target feature-map ring slot, each slot's zero-padded map
is staged into VMEM once (~7.5MB at 1/4 res), and every window dot is
computed from VMEM. HBM traffic collapses to one pass over the feature
rings + the per-edge patch features.

Semantics identical to ops.corr / the reference kernel
(altcorr/correlation_kernel.cu:83-136,221-232): (2R+2)² raw window dots at
floor(coords), bilinear 2x2 blend to (2R+1)², zero out-of-bounds taps,
final (x-shift, y-shift) window order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

E_BLK = 256


def _kernel(slot_of_block, fmap_hbm, f1_ref, sy_ref, sx_ref, out_ref,
            scratch, sem, *, D):
    """One edge block. The block's slot map is DMA'd from HBM into a single
    VMEM scratch only when the slot changes between consecutive blocks
    (edges are sorted by slot), avoiding double-buffering the ~8MB map.

    Mosaic requires sublane-dim (W) slice starts to be 8-aligned, so a
    16-wide aligned window is dotted; the caller extracts the D relevant
    columns with a one-hot einsum."""
    b = pl.program_id(0)
    slot = slot_of_block[b]
    prev = slot_of_block[jnp.maximum(b - 1, 0)]
    need = jnp.logical_or(b == 0, slot != prev)

    @pl.when(need)
    def _load():
        cp = pltpu.make_async_copy(fmap_hbm.at[slot], scratch, sem)
        cp.start()
        cp.wait()

    def edge(e, carry):
        for q in range(f1_ref.shape[1]):  # P*P, unrolled
            y = sy_ref[e, q]
            xa = (sx_ref[e, q] // 8) * 8
            win = scratch[pl.ds(y, D), pl.ds(xa, 2 * D), :]  # [D, 2D, C]
            g = f1_ref[e, q, :]  # [C]
            dots = jnp.sum(
                win.astype(jnp.float32) * g.astype(jnp.float32)[None, None, :],
                axis=-1,
            )
            out_ref[e, q, :, :] = dots
        return carry

    jax.lax.fori_loop(0, E_BLK, edge, 0)


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
    pad = 2 * D

    # ---- group edges by slot, pad groups to E_BLK multiples ----
    jj = jnp.clip(jj, 0, MEM - 1).astype(jnp.int32)
    order = jnp.argsort(jj)
    jj_s = jj[order]
    counts = jax.ops.segment_sum(jnp.ones_like(jj), jj, num_segments=MEM)
    group_start = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                   jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    rank = jnp.arange(E, dtype=jnp.int32) - group_start[jj_s]
    padded_counts = ((counts + E_BLK - 1) // E_BLK) * E_BLK
    padded_start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32),
         jnp.cumsum(padded_counts)[:-1].astype(jnp.int32)]
    )
    pos = padded_start[jj_s] + rank

    E_pad = int(np.ceil(E / E_BLK) * E_BLK) + MEM * E_BLK  # static capacity
    NB = E_pad // E_BLK
    blk_slot = (
        jnp.searchsorted(
            padded_start, jnp.arange(NB, dtype=jnp.int32) * E_BLK, side="right"
        ).astype(jnp.int32) - 1
    )
    blk_slot = jnp.clip(blk_slot, 0, MEM - 1)

    # ---- per-(edge, pixel) window starts in the padded map ----
    x = coords[..., 0]
    y = coords[..., 1]
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    sy = jnp.clip(y0, -D, H + D) - R + pad  # in [0, Hp - D]
    sx = jnp.clip(x0, -D, W + D) - R + pad

    f1 = jnp.take(gmap, ii, axis=0).reshape(E, P * P, C)

    def pad_scatter(arr, fill=0):
        out = jnp.full((E_pad,) + arr.shape[1:], fill, arr.dtype)
        return out.at[pos].set(arr[order])

    f1_p = pad_scatter(f1)
    sy_p = pad_scatter(sy.reshape(E, P * P))
    sx_p = pad_scatter(sx.reshape(E, P * P))

    # extra right x-pad: aligned 16-wide loads can overrun by up to 8
    fpad = jnp.pad(fmap, ((0, 0), (pad, pad), (pad, pad + 8), (0, 0)))
    Hp, Wp = H + 2 * pad, W + 2 * pad + 8

    vol_p = pl.pallas_call(
        functools.partial(_kernel, D=D),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NB,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((E_BLK, P * P, C), lambda b, sob: (b, 0, 0)),
                pl.BlockSpec((E_BLK, P * P), lambda b, sob: (b, 0)),
                pl.BlockSpec((E_BLK, P * P), lambda b, sob: (b, 0)),
            ],
            out_specs=pl.BlockSpec(
                (E_BLK, P * P, D, 2 * D), lambda b, sob: (b, 0, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((Hp, Wp, C), fmap.dtype),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((E_pad, P * P, D, 2 * D), jnp.float32),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(blk_slot, fpad, f1_p, sy_p, sx_p)

    # unsort back to input edge order
    vol16 = jnp.zeros((E, P * P, D, 2 * D), jnp.float32).at[order].set(
        vol_p[pos]
    )
    # extract the D columns starting at the intra-alignment remainder
    rem = (sx % 8).reshape(E, P * P)  # in [0, 8)
    sel = (
        rem[:, :, None, None] + jnp.arange(D)[None, None, :, None]
        == jnp.arange(2 * D)[None, None, None, :]
    ).astype(vol16.dtype)  # [E, PP, D(out col), 2D(src col)]
    vol = jnp.einsum("eqyz,eqxz->eqyx", vol16, sel)
    vol = vol.reshape(E, P, P, D, D)

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
