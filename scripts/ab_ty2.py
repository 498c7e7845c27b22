"""In-process A/B: fused2 level-2 tile TY2=10/SPREAD2=1 vs the shipped
16/4 (cross-process bench runs swing +-40% on the shared chip; only
in-process deltas are signal). Times the kernel at bench shapes.

RESULT (r04, v5e): TY2=10 LOSES by ~2.2 ms — 10 rows isn't
8-sublane-aligned, so the tile slice/reshape relayout outweighs the
smaller dot (2 vs 3 MXU column tiles) and the saved roll bit. The module
ships 16/4; this script monkeypatches the candidate.

Run alone: python scripts/ab_ty2.py
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
    slotmap = jnp.asarray(np.arange(512) % MEM, jnp.int32)

    def run():
        return cp.corr_lattice_fused2(
            gmap_r, fmap1, fmap2, coords, cell_valid,
            jnp.int32(n), slotmap, r=r,
        )

    t_old = timeit(run)  # shipped tile (16/4)
    out_old = np.asarray(run(), np.float32)

    cp.SPREAD2, cp.TY2 = 1, 10  # the candidate small tile
    jax.clear_caches()
    t_new = timeit(run)
    out_new = np.asarray(run(), np.float32)
    cp.SPREAD2, cp.TY2 = 4, 16

    # parity between the two tiles on in-spread geometry (offsets < 2 px,
    # all windows in-tile for both): must match to float noise
    d = np.abs(out_new - out_old).max()
    s = np.abs(out_old).max()
    print(f"TY2=10 (new): {t_new:6.2f} ms")
    print(f"TY2=16 (old): {t_old:6.2f} ms   delta {t_old - t_new:+.2f} ms")
    print(f"in-spread parity |new-old|max {d:.2e} (scale {s:.1f})")
    assert d <= 2e-2 * s, "TY2 tile change altered in-spread output"


if __name__ == "__main__":
    main()
