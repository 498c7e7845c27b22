"""TPU A/B: corr_lattice_paired (in-kernel blend+compaction) vs
corr_lattice2_stacked (band output + XLA finish) at production size.

Run alone on the real chip: PYTHONPATH=. python scripts/ab_corr_paired.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from rampvo_tpu.ops.corr_pallas import (
    corr_lattice2_stacked,
    corr_lattice_compact,
    corr_lattice_fused,
    corr_lattice_paired,
)


def main():
    rng = np.random.RandomState(0)
    NI, T, M, P, C = 25, 25, 96, 3, 128
    MEM, H, W = 40, 120, 160
    r = (T + 1) // 2
    n = 40
    L = 512

    gmap_r = jnp.asarray(rng.rand(MEM, M, P, P, C), jnp.bfloat16)
    fmap1 = jnp.asarray(rng.rand(MEM, H, W, C), jnp.bfloat16)
    fmap2 = jnp.asarray(rng.rand(MEM, H // 4, W // 4, C), jnp.bfloat16)
    cen = rng.rand(NI, T, M, 1, 1, 2) * np.array([W + 12, H + 12]) - 6
    off = rng.rand(NI, T, M, P, P, 2) * 4 - 2
    coords = jnp.asarray(cen + off, jnp.float32)

    i_row = np.arange(NI)[:, None]
    tt = np.arange(T)[None, :]
    i = n - 1 - np.mod(n - 1 - i_row, NI) + 0 * tt
    j = i + tt - (r - 1)
    cell_valid = jnp.asarray(
        (i >= 0) & (j >= 0) & (j <= n - 1) & (i >= n - (NI - 3))
    )
    slotmap = np.full(L, -1, np.int32)
    for f in range(max(0, n - MEM + 2), n):
        slotmap[f] = f % MEM
    slotmap = jnp.asarray(slotmap)
    nn_ = jnp.int32(n)

    def run_compact():
        return corr_lattice_compact(
            gmap_r, fmap1, fmap2, coords, cell_valid, nn_, slotmap, r, 3
        )

    def run_fused():
        return corr_lattice_fused(
            gmap_r, fmap1, fmap2, coords, cell_valid, nn_, slotmap, r, 3
        )

    def run_stacked():
        return corr_lattice2_stacked(
            gmap_r, fmap1, fmap2, coords, cell_valid, nn_, slotmap, r, 3,
            folded=True,
        )

    t0 = time.perf_counter()
    out_f = run_fused()
    float(jnp.sum(out_f.astype(jnp.float32)[:64]))
    print(f"fused compile+run: {time.perf_counter() - t0:.1f}s "
          f"out={out_f.shape}")
    t0 = time.perf_counter()
    out_c = run_compact()
    float(jnp.sum(out_c.astype(jnp.float32)[:64]))
    print(f"compact compile+run: {time.perf_counter() - t0:.1f}s "
          f"out={out_c.shape}")
    t0 = time.perf_counter()
    out_s = run_stacked()
    float(jnp.sum(out_s.astype(jnp.float32)[:64]))
    print(f"stacked compile+run: {time.perf_counter() - t0:.1f}s "
          f"out={out_s.shape}")

    def timeit(fn, n_it=20):
        fn()
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(n_it):
                out = fn()
            float(jnp.sum(out.astype(jnp.float32)[:64]))
            best = min(best, (time.perf_counter() - t0) / n_it)
        return best

    tf = timeit(run_fused)
    tc = timeit(run_compact)
    ts = timeit(run_stacked)
    print(f"fused:   {tf*1e3:6.1f} ms/call")
    print(f"compact: {tc*1e3:6.1f} ms/call")
    print(f"stacked: {ts*1e3:6.1f} ms/call")


if __name__ == "__main__":
    main()
