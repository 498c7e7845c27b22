"""TPU A/B for corr_lattice2: Mosaic-lowered parity vs the XLA oracle at
full production size, plus per-call timing vs corr_pallas2.

Run on the real chip: python scripts/ab_corr_lattice.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from rampvo_tpu.ops.corr import corr
from rampvo_tpu.ops.corr_pallas import corr_lattice2, corr_pallas2


def main():
    rng = np.random.RandomState(0)
    NI, T, M, P, C = 25, 25, 96, 3, 128
    MEM, H, W = 32, 120, 160
    r = (T + 1) // 2
    n = 40
    L = 512
    fdt = jnp.bfloat16

    gmap_r = jnp.asarray(rng.rand(MEM, M, P, P, C), fdt)
    fmap1 = jnp.asarray(rng.rand(MEM, H, W, C), fdt)
    fmap2 = jnp.asarray(rng.rand(MEM, H // 4, W // 4, C), fdt)
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

    # ---- lattice kernel ----
    t0 = time.perf_counter()
    c1, c2 = corr_lattice2(
        gmap_r, fmap1, fmap2, coords, cell_valid, jnp.int32(n), slotmap, r, 3
    )
    c1.block_until_ready()
    print(f"lattice compile+run: {time.perf_counter() - t0:.1f}s")

    # ---- flat oracle on the valid edges ----
    ii = jnp.asarray(np.broadcast_to(i[:, :, None], (NI, T, M)).reshape(-1))
    jj = jnp.asarray(np.broadcast_to(j[:, :, None], (NI, T, M)).reshape(-1))
    m_ = np.broadcast_to(np.arange(M)[None, None, :], (NI, T, M)).reshape(-1)
    v = np.broadcast_to(
        np.asarray(cell_valid)[:, :, None], (NI, T, M)
    ).reshape(-1)
    slot_j = jnp.clip(slotmap[jnp.clip(jj, 0, L - 1)], 0, MEM - 1)
    gslot = jnp.clip(slotmap[jnp.clip(ii, 0, L - 1)], 0, MEM - 1)
    gidx = gslot * M + jnp.asarray(m_)
    cflat = coords.reshape(-1, P, P, 2)
    gflat = gmap_r.reshape(MEM * M, P, P, C)
    # full-size XLA corr would materialize gathered windows (>16GB); use the
    # round-1-validated sorted-group Pallas kernel as the reference
    a1, a2 = corr_pallas2(gflat, fmap1, fmap2, cflat, gidx, slot_j, 3)

    vb = jnp.asarray(v)[:, None, None, None]
    scale = float(jnp.abs(a1).max())
    d1 = float(jnp.abs(jnp.where(vb, a1 - c1, 0.0)).max())
    d2 = float(jnp.abs(jnp.where(vb, a2 - c2, 0.0)).max())
    print(f"parity: d1={d1/scale:.2e} d2={d2/scale:.2e} (rel, scale={scale:.1f})")
    assert d1 / scale < 1e-2 and d2 / scale < 1e-2

    # finite outputs everywhere (incl. invalid cells)
    assert bool(jnp.isfinite(c1).all()) and bool(jnp.isfinite(c2).all())

    # ---- timing ----
    def timeit(fn, n_it=20):
        fn()  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(n_it):
                out = fn()
            float(jnp.sum(out[0].astype(jnp.float32)[:64, 0, 0]))
            best = min(best, (time.perf_counter() - t0) / n_it)
        return best

    tl = timeit(lambda: corr_lattice2(
        gmap_r, fmap1, fmap2, coords, cell_valid, jnp.int32(n), slotmap, r, 3
    ))
    tp = timeit(lambda: corr_pallas2(gflat, fmap1, fmap2, cflat, gidx, slot_j, 3))
    print(f"lattice: {tl*1e3:.1f} ms/call   pallas2(sorted): {tp*1e3:.1f} ms/call")


if __name__ == "__main__":
    main()
