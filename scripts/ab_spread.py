"""On-chip A/B: fused2 kernel with SPREAD=4/TY=16 (default) vs SPREAD=2/TY=12.

The MXU dot + alignment rolls + tile reads all scale with TY*TX; SPREAD=2
shrinks TY 16->12 (TX stays 24 — the 8-alignment slack floors it). The
cost is accuracy: patch pixels reprojecting >SPREAD px from the patch
center get zeroed corr. The synthetic coords here use +-`JITTER` px pixel
offsets so the parity column shows the approximation magnitude at each
setting (real sequences: offsets are the reprojected 3x3 grid, ~1 px).

Run alone: python scripts/ab_spread.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import importlib

# `rampvo_tpu.ops` re-exports a FUNCTION named corr_pallas which shadows
# the submodule on `import a.b as c` (getattr wins over sys.modules)
cp = importlib.import_module("rampvo_tpu.ops.corr_pallas")

JITTER = 1.5  # px pixel-offset scale for the synthetic patch grids


def timeit(fn, n_it=10):
    out = fn()
    float(jnp.sum(out.astype(jnp.float32)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_it):
            out = fn()
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
    off = rng.rand(NI, T, M, P, P, 2) * 2 * JITTER - JITTER
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
            slotmap, r, 3)

    # NOTE lane/MXU quantization: TY*TX rounds up to 128-lane VREGs and
    # 128-col MXU passes, so 288 (SPREAD=2) costs the same as 384; only
    # crossing a 128 boundary pays off -> 240 (SPREAD=1, 2 VREGs/passes).
    ref = None
    for spread, ty in ((4, 16), (2, 12), (1, 10)):
        cp.SPREAD, cp.TY = spread, ty
        cp.corr_lattice_fused2.clear_cache()
        out = cp.corr_lattice_fused2(*args)
        o = np.asarray(out, np.float32)
        assert np.isfinite(o).all()
        if ref is None:
            ref = o
            scale = np.abs(ref).max()
        d = np.abs(ref - o).max()
        t = timeit(lambda: cp.corr_lattice_fused2(*args))
        print(f"SPREAD={spread} TY={ty} TY*TX={ty * cp.TX:3d}: "
              f"{t:6.2f} ms   vs-default {d / scale:.2e} rel", flush=True)


if __name__ == "__main__":
    main()
