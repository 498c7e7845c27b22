"""CPU interpret-mode parity check: corr_lattice_paired vs corr_lattice2.

Unfolds the paired layout through paired_corr_perm back to the reference
stacked layout and compares against corr_stack(corr_lattice2(...)).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = flags

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from rampvo_tpu.ops.corr import corr_stack
from rampvo_tpu.ops.corr_pallas import (
    corr_lattice2,
    corr_lattice_compact,
    corr_lattice_fused,
    corr_lattice_paired,
    paired_corr_perm,
)


def main():
    rng = np.random.RandomState(0)
    NI, T, M, P, C = 5, 5, 8, 3, 128
    MEM, H, W = 6, 40, 48
    r = (T + 1) // 2
    n = 7
    L = 32

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
    slotmap = np.full(L, -1, np.int32)
    for f in range(max(0, n - MEM + 1), n):
        slotmap[f] = f % MEM
    slotmap = jnp.asarray(slotmap)

    c1, c2 = corr_lattice2(
        gmap_r, fmap1, fmap2, coords, cell_valid, jnp.int32(n), slotmap,
        r, 3, interpret=True,
    )
    ref = np.asarray(corr_stack(c1, c2), np.float32)  # [E, 882]

    paired = np.asarray(
        corr_lattice_paired(
            gmap_r, fmap1, fmap2, coords, cell_valid, jnp.int32(n), slotmap,
            r, 3, interpret=True,
        ),
        np.float32,
    )  # [E, PP*128]

    idx = paired_corr_perm(P, 3)
    E = NI * T * M
    rec = np.zeros((E, ref.shape[1]), np.float32)
    for c, rc in enumerate(idx):
        if rc >= 0:
            rec[:, rc] = paired[:, c]

    scale = np.abs(ref).max()
    d = np.abs(ref - rec).max()
    print(f"paired parity: {d/scale:.2e} rel (scale {scale:.2f})")
    assert np.isfinite(paired).all(), "non-finite paired output"
    assert d / scale < 2e-2, d / scale

    compact = np.asarray(
        corr_lattice_compact(
            gmap_r, fmap1, fmap2, coords, cell_valid, jnp.int32(n), slotmap,
            r, 3, interpret=True,
        ),
        np.float32,
    )
    rec2 = np.zeros((E, ref.shape[1]), np.float32)
    for c, rc in enumerate(idx):
        if rc >= 0:
            rec2[:, rc] = compact[:, c]
    d2 = np.abs(ref - rec2).max()
    print(f"compact parity: {d2/scale:.2e} rel")
    assert np.isfinite(compact).all(), "non-finite compact output"
    assert d2 / scale < 2e-2, d2 / scale

    fused = np.asarray(
        corr_lattice_fused(
            gmap_r, fmap1, fmap2, coords, cell_valid, jnp.int32(n), slotmap,
            r, 3, interpret=True,
        ),
        np.float32,
    )
    rec3 = np.zeros((E, ref.shape[1]), np.float32)
    for c, rc in enumerate(idx):
        if rc >= 0:
            rec3[:, rc] = fused[:, c]
    d3 = np.abs(ref - rec3).max()
    print(f"fused parity: {d3/scale:.2e} rel")
    assert np.isfinite(fused).all(), "non-finite fused output"
    assert d3 / scale < 2e-2, d3 / scale
    print("OK")


if __name__ == "__main__":
    main()
