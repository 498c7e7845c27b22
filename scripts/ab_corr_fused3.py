"""In-process A/B: corr_lattice_fused3 (strip-major tiles, small level-2
tile, blend-folded S4) vs corr_lattice_fused2 at bench shapes, PLANAR
coords (the production call form). Cross-process bench runs swing +-40%
on the shared chip; only in-process deltas are signal.

Parity: offsets are kept within +-2 px so every window is in-spread for
both kernels at both levels (SPREAD2_S=1 vs SPREAD2=4 differ only on
windows whose level-1 offset exceeds SPREAD) — outputs must match to
float noise.

Run alone: python scripts/ab_corr_fused3.py
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

    # planar coords: centers + per-px offsets within +-2 px (in-spread for
    # both kernels at both levels)
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
    fp1 = cp._pad_ring(fmap1, pad)
    fp2 = cp._pad_ring(fmap2, pad)
    st1 = cp.make_strips(fp1)
    st2 = cp.make_strips(fp2)
    hw = (H, W, H // 4, W // 4)
    lat = (NI, T, M, P)
    coords = (u, v, uc, vc)

    def run2():
        return cp.corr_lattice_fused2(
            gmap_r, fp1, fp2, coords, cell_valid, jnp.int32(n), slotmap,
            r=r, prepadded=True, hw=hw, lat=lat,
        )

    def run3(roll_bf16=False):
        return cp.corr_lattice_fused3(
            gmap_r, st1, st2, coords, cell_valid, jnp.int32(n), slotmap,
            r=r, prestripped=True, hw=hw, lat=lat, roll_bf16=roll_bf16,
        )

    t2 = timeit(run2)
    out2 = np.asarray(run2(), np.float32)
    t3 = timeit(run3)
    out3 = np.asarray(run3(), np.float32)
    t3h = timeit(run3, True)
    out3h = np.asarray(run3(True), np.float32)
    t2b = timeit(run2)  # chip-drift check
    t3b = timeit(run3)

    s = np.abs(out2).max()
    d3 = np.abs(out3 - out2).max()
    d3h = np.abs(out3h - out2).max()
    print(f"fused2     : {t2:6.2f} ms  (re-run {t2b:6.2f} ms)")
    print(f"fused3     : {t3:6.2f} ms  (re-run {t3b:6.2f} ms)  "
          f"delta {t2 - t3:+.2f} ms")
    print(f"fused3-b16 : {t3h:6.2f} ms  (bf16 roll/extract chain)  "
          f"delta {t3 - t3h:+.2f} ms vs f32 rolls")
    print(f"in-spread parity |f3-f2|max {d3:.2e}  "
          f"|f3b16-f2|max {d3h:.2e} (scale {s:.1f})")
    assert d3 <= 2e-2 * s, "fused3 diverges from fused2 on in-spread windows"
    assert d3h <= 2e-2 * s, "bf16-roll fused3 diverges"


if __name__ == "__main__":
    main()
