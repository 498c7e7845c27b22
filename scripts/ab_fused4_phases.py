"""On-chip cost attribution for corr_lattice_fused4: cumulative phase
drops (same method as ab_fused2_phases; timing-only, output garbage).

Run alone: python scripts/ab_fused4_phases.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import rampvo_tpu.ops.corr_pallas as cp


def timeit(fn, *args, n_it=10):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_it):
            out = fn(*args)
        float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / n_it)
    return best * 1e3


def main():
    rng = np.random.RandomState(0)
    NI, T, M, P, C = 25, 25, 96, 3, 128
    PP = P * P
    MEM, H, W = 40, 120, 160
    r = (T + 1) // 2
    n = 40
    NC = NI * T

    gmap_r = jnp.asarray(rng.rand(MEM, M, P, P, C), jnp.bfloat16)
    fmap1 = jnp.asarray(rng.rand(MEM, H, W, C), jnp.bfloat16)
    fmap2 = jnp.asarray(rng.rand(MEM, H // 4, W // 4, C), jnp.bfloat16)
    ucn = rng.rand(NC, M) * (W + 8) - 4
    vcn = rng.rand(NC, M) * (H + 8) - 4
    du = rng.rand(NC, M, PP) * 4 - 2
    dv = rng.rand(NC, M, PP) * 4 - 2
    u = jnp.asarray(ucn[:, :, None] + du, jnp.float32).reshape(NC, M * PP)
    v = jnp.asarray(vcn[:, :, None] + dv, jnp.float32).reshape(NC, M * PP)
    uc = jnp.asarray(ucn, jnp.float32)
    vc = jnp.asarray(vcn, jnp.float32)
    i_row = np.arange(NI)[:, None]
    tt = np.arange(T)[None, :]
    i = n - 1 - np.mod(n - 1 - i_row, NI) + 0 * tt
    j = i + tt - (r - 1)
    cell_valid = jnp.asarray((i >= 0) & (j >= 0) & (j <= n - 1))
    slotmap = jnp.asarray(np.arange(512) % MEM, jnp.int32)

    pad = cp.RING_PAD
    st1 = cp.make_strips(cp._pad_ring(fmap1, pad))
    st2 = cp.make_strips(cp._pad_ring(fmap2, pad))
    hw = (H, W, H // 4, W // 4)
    lat = (NI, T, M, P)
    coords = (u, v, uc, vc)
    args = (gmap_r, st1, st2, coords, cell_valid, jnp.int32(n), slotmap)

    CUTS = [
        ("full", ()),
        ("-blend", ("blend",)),
        ("-blend-smat", ("blend", "smat")),
        ("-blend-smat-rolls", ("blend", "smat", "rolls")),
        ("-all(+dots)", ("blend", "smat", "rolls", "dots")),
        ("noloop", ("noloop",)),
        # fixed-cost split: pin the strip-slot input / the out block to
        # constants so every step revisits the same block (DMA elided)
        ("noloop-pinslot", ("noloop", "pinslot")),
        ("noloop-pinout", ("noloop", "pinout")),
        ("noloop-pinboth", ("noloop", "pinslot", "pinout")),
    ]
    ts = {}
    for name, ab in CUTS:
        fn = jax.jit(
            lambda g, f1, f2, c, cv, nn, sm, ab=ab: cp.corr_lattice_fused4(
                g, f1, f2, c, cv, nn, sm, r, 3, ablate=ab,
                prestripped=True, hw=hw, lat=lat, tb=25,
            )
        )
        ts[name] = timeit(fn, *args)
        print(f"{name:20s} {ts[name]:6.2f} ms", flush=True)

    print(f"\nblend : {ts['full'] - ts['-blend']:6.2f} ms")
    print(f"smat  : {ts['-blend'] - ts['-blend-smat']:6.2f} ms")
    print(f"rolls : {ts['-blend-smat'] - ts['-blend-smat-rolls']:6.2f} ms")
    print(f"dots  : {ts['-blend-smat-rolls'] - ts['-all(+dots)']:6.2f} ms")
    print(f"fixed : {ts['-all(+dots)']:6.2f} ms "
          f"(noloop = grid+slotDMA {ts['noloop']:6.2f} ms)")
    nl = ts["noloop"]
    print(f"  slot DMA share : {nl - ts['noloop-pinslot']:6.2f} ms")
    print(f"  out DMA share  : {nl - ts['noloop-pinout']:6.2f} ms")
    print(f"  grid residual  : {ts['noloop-pinboth']:6.2f} ms")


if __name__ == "__main__":
    main()
