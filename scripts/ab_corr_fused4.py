"""On-chip A/B + numeric parity: corr_lattice_fused4 (cell-batched grid)
vs corr_lattice_fused3 (one cell per grid step) at bench shapes, one
process. fused4's claim: identical math, ~546 -> ~NTGT*ceil(T/TB) grid
steps, so the ~4.2 ms of per-step Pallas machinery mostly disappears.

Run alone: PYTHONPATH=.:/root/.axon_site python scripts/ab_corr_fused4.py [tb ...]
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

    f3 = jax.jit(lambda *a: cp.corr_lattice_fused3(
        *a, r, 3, prestripped=True, hw=hw, lat=lat))
    t3 = timeit(f3, *args)
    out3 = np.asarray(f3(*args), np.float32)
    print(f"fused3        : {t3:6.2f} ms", flush=True)

    tbs = [int(x) for x in sys.argv[1:]] or [13, 25, 7]
    for tb in tbs:
        f4 = jax.jit(lambda *a, tb=tb: cp.corr_lattice_fused4(
            *a, r, 3, prestripped=True, hw=hw, lat=lat, tb=tb))
        t4 = timeit(f4, *args)
        out4 = np.asarray(f4(*args), np.float32)
        scale = np.abs(out3).max()
        d = np.abs(out4 - out3).max()
        print(f"fused4 tb={tb:3d} : {t4:6.2f} ms   "
              f"parity maxrel {d / scale:.2e}", flush=True)


if __name__ == "__main__":
    main()
