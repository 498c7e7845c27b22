"""One-process TPU A/B: corr_lattice_fused2 variants at bench
shapes (480x640, M=96, default windows). Also cross-checks fused2 vs fused
numerically ON CHIP (Mosaic-lowered, not interpret).

Run alone: python scripts/ab_corr_fused2.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from rampvo_tpu.ops.corr_pallas import (
    corr_lattice_fused2,
)


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
            slotmap, r, 3)

    a = corr_lattice_fused2(*args)
    scale = float(jnp.abs(a.astype(jnp.float32)).max())

    VARIANTS = [
        ("fused2(pin)", corr_lattice_fused2, {}),
        ("fused2 nopin", corr_lattice_fused2, {"pin_inputs": False}),
    ]
    for name, fn, kw in VARIANTS:
        try:
            b = fn(*args, **kw)
            d = float(jnp.abs(
                a.astype(jnp.float32) - b.astype(jnp.float32)
            ).max())
            assert np.isfinite(np.asarray(b, np.float32)).all()
            assert d / scale < 1e-2, d / scale
            t = timeit(lambda fn=fn, kw=kw: fn(*args, **kw))
            print(f"{name:18s} {t:6.2f} ms   parity {d/scale:.2e} rel",
                  flush=True)
        except Exception as e:
            print(f"{name:18s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
