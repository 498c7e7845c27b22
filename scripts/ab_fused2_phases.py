"""On-chip cost attribution for corr_lattice_fused2: cumulative phase drops.

The fused2 kernel's ~33 ms at bench shapes is some mix of (a) per-edge MXU
dots + tile VMEM reads, (b) 8 binary alignment rolls + selects, (c) the S
extraction matmul, (d) the 3-roll bilinear blend, (e) grid machinery +
slot DMAs + output writes. `ablate` drops phases (timing-only; output is
garbage), so successive deltas attribute the cost:

    full            = a+b+c+d+e
    -blend          = a+b+c+e
    -blend-smat     = a+b+e
    -blend-smat-rolls = a+e
    -all (also dots)  = e

Run alone: python scripts/ab_fused2_phases.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from rampvo_tpu.ops.corr_pallas import corr_lattice_fused2


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
    MEM, H, W = 40, 120, 160
    r = (T + 1) // 2
    n = 40

    gmap_r = jnp.asarray(rng.rand(MEM, M, P, P, C), jnp.bfloat16)
    fmap1 = jnp.asarray(rng.rand(MEM, H, W, C), jnp.bfloat16)
    fmap2 = jnp.asarray(rng.rand(MEM, H // 4, W // 4, C), jnp.bfloat16)
    cen = rng.rand(NI, T, M, 1, 1, 2) * np.array([W + 8, H + 8]) - 4
    off = rng.rand(NI, T, M, P, P, 2) * 4 - 2
    coords = jnp.asarray(cen + off, jnp.float32)
    i_row = np.arange(NI)[:, None]
    tt = np.arange(T)[None, :]
    i = n - 1 - np.mod(n - 1 - i_row, NI) + 0 * tt
    j = i + tt - (r - 1)
    cell_valid = jnp.asarray((i >= 0) & (j >= 0) & (j <= n - 1))
    L = 512
    slotmap = np.full(L, -1, np.int32)
    for f in range(max(0, n - MEM + 1), n):
        slotmap[f] = f % MEM
    slotmap = jnp.asarray(slotmap)

    args = (gmap_r, fmap1, fmap2, coords, cell_valid, jnp.int32(n),
            slotmap)

    CUTS = [
        ("full", ()),
        ("-blend", ("blend",)),
        ("-blend-smat", ("blend", "smat")),
        ("-blend-smat-rolls", ("blend", "smat", "rolls")),
        ("-all(+dots)", ("blend", "smat", "rolls", "dots")),
    ]
    ts = {}
    for name, ab in CUTS:
        fn = jax.jit(
            lambda g, f1, f2, c, cv, nn, sm, ab=ab: corr_lattice_fused2(
                g, f1, f2, c, cv, nn, sm, r, 3, ablate=ab
            )
        )
        ts[name] = timeit(fn, *args)
        print(f"{name:20s} {ts[name]:6.2f} ms", flush=True)

    print(f"\nblend : {ts['full'] - ts['-blend']:6.2f} ms")
    print(f"smat  : {ts['-blend'] - ts['-blend-smat']:6.2f} ms")
    print(f"rolls : {ts['-blend-smat'] - ts['-blend-smat-rolls']:6.2f} ms")
    print(f"dots  : {ts['-blend-smat-rolls'] - ts['-all(+dots)']:6.2f} ms")
    print(f"fixed : {ts['-all(+dots)']:6.2f} ms")

    # decompose the fixed cost: out VREG stores, out write-back DMAs,
    # per-step grid machinery
    base = ("blend", "smat", "rolls", "dots")
    FIX = [
        ("fx-base", base),
        ("fx+nors", base + ("nors",)),
        ("fx+nostore", base + ("nostore",)),
        ("fx+nostore+pinout", base + ("nostore", "pinout")),
        ("fx+ns+po+halfgrid", base + ("nostore", "pinout", "halfgrid")),
        ("fx+novcol", base + ("novcol",)),
        ("fx+noscal", base + ("noscal",)),
    ]
    fs = {}
    for name, ab in FIX:
        fn = jax.jit(
            lambda g, f1, f2, c, cv, nn, sm, ab=ab: corr_lattice_fused2(
                g, f1, f2, c, cv, nn, sm, r, 3, ablate=ab
            )
        )
        fs[name] = timeit(fn, *args)
        print(f"{name:20s} {fs[name]:6.2f} ms", flush=True)
    print(f"\nrs roundtrip: {fs['fx-base'] - fs['fx+nors']:6.2f} ms")
    print(f"out stores  : {fs['fx-base'] - fs['fx+nostore']:6.2f} ms")
    print(f"out wb DMAs : "
          f"{fs['fx+nostore'] - fs['fx+nostore+pinout']:6.2f} ms")
    print(f"grid/2      : "
          f"{fs['fx+nostore+pinout'] - fs['fx+ns+po+halfgrid']:6.2f} ms")
    print(f"vcol DMAs   : {fs['fx-base'] - fs['fx+novcol']:6.2f} ms")
    print(f"scal DMAs   : {fs['fx-base'] - fs['fx+noscal']:6.2f} ms")

    # prologue+epilogue without the kernel, at BOTH padding modes: the
    # production path (vo/runtime) passes prepadded=True, the A/B harness
    # pads in-graph — the delta is the non-production pad cost
    fn = jax.jit(
        lambda g, f1, f2, c, cv, nn, sm: corr_lattice_fused2(
            g, f1, f2, c, cv, nn, sm, r, 3, ablate=("noker",)
        )
    )
    t_nk = timeit(fn, *args)
    print(f"\nnoker (prologue+epilogue, in-graph pad): {t_nk:6.2f} ms")
    from rampvo_tpu.ops.corr_pallas import RING_PAD, _pad_ring
    fp1 = _pad_ring(fmap1, RING_PAD)
    fp2 = _pad_ring(fmap2, RING_PAD)
    hw = (H, W, H // 4, W // 4)
    args_pp = (gmap_r, fp1, fp2, coords, cell_valid, jnp.int32(n), slotmap)
    fn = jax.jit(
        lambda g, f1, f2, c, cv, nn, sm: corr_lattice_fused2(
            g, f1, f2, c, cv, nn, sm, r, 3, ablate=("noker",),
            prepadded=True, hw=hw,
        )
    )
    t_nkp = timeit(fn, *args_pp)
    print(f"noker prepadded (production prologue)  : {t_nkp:6.2f} ms")
    fn = jax.jit(
        lambda g, f1, f2, c, cv, nn, sm: corr_lattice_fused2(
            g, f1, f2, c, cv, nn, sm, r, 3, prepadded=True, hw=hw,
        )
    )
    t_fp = timeit(fn, *args_pp)
    print(f"full prepadded (production corr call)  : {t_fp:6.2f} ms")
    print(f"  => kernel proper : {t_fp - t_nkp:6.2f} ms")
    print(f"  => prologue+epi  : {t_nkp:6.2f} ms")


if __name__ == "__main__":
    main()
