"""Pallas correlation kernels vs the exact XLA formulation (interpret mode).

The kernels' contract: exact match for patch pixels within SPREAD px of
their patch center (realistic geometry — patch depth is constant per patch);
farther pixels get zeroed windows (see ops/corr_pallas.py docstring).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rampvo_tpu.ops.corr import corr
from rampvo_tpu.ops.corr_pallas import (
    corr_lattice2,
    corr_lattice2_stacked,
)


def make_problem(seed=0, E=120, P=3, C=128, H=40, W=64, MEM=4, Mg=32):
    rng = np.random.RandomState(seed)
    gmap = jnp.asarray(rng.rand(Mg, P, P, C), jnp.float32)
    fmap1 = jnp.asarray(rng.rand(MEM, H, W, C), jnp.float32)
    fmap2 = jnp.asarray(rng.rand(MEM, H // 4, W // 4, C), jnp.float32)
    # centers incl. out-of-bounds; pixels arranged like a reprojected patch
    cen = rng.rand(E, 1, 1, 2) * np.array([W + 24, H + 24]) - 12
    grid = np.stack(
        np.meshgrid([-1, 0, 1], [-1, 0, 1], indexing="ij"), -1
    )[..., ::-1][None]
    off = grid * (1 + rng.rand(E, 1, 1, 1) * 2.0) + rng.rand(E, P, P, 2) * 0.5
    coords = jnp.asarray(cen + off, jnp.float32)
    ii = jnp.asarray(rng.randint(0, Mg, E), jnp.int32)
    jj = jnp.asarray(rng.randint(0, MEM, E), jnp.int32)
    return gmap, fmap1, fmap2, coords, ii, jj


class TestCorrLattice:
    @pytest.mark.slow
    def test_lattice_matches_xla(self):
        """corr_lattice2 on a synthetic lattice == corr over the flat
        edge view, for valid cells (invalid cells are undefined)."""
        rng = np.random.RandomState(3)
        NI, T, M, P, C = 5, 7, 8, 3, 128
        MEM, H, W = 6, 40, 64
        r = (T + 1) // 2
        n = 9
        gmap_r = jnp.asarray(rng.rand(MEM, M, P, P, C), jnp.float32)
        fmap1 = jnp.asarray(rng.rand(MEM, H, W, C), jnp.float32)
        fmap2 = jnp.asarray(rng.rand(MEM, H // 4, W // 4, C), jnp.float32)
        cen = rng.rand(NI, T, M, 1, 1, 2) * np.array([W + 12, H + 12]) - 6
        off = rng.rand(NI, T, M, P, P, 2) * 4 - 2
        coords = jnp.asarray(cen + off, jnp.float32)
        # valid cells: host alive & j in range (mimics edge_table rules)
        i_row = np.arange(NI)[:, None]
        tt = np.arange(T)[None, :]
        i = n - 1 - np.mod(n - 1 - i_row, NI) + 0 * tt
        j = i + tt - (r - 1)
        cell_valid = jnp.asarray(
            (i >= 0) & (j >= 0) & (j <= n - 1) & (rng.rand(NI, T) < 0.7)
        )
        slotmap = jnp.asarray(rng.randint(0, MEM, 64), jnp.int32)

        c1, c2 = corr_lattice2(
            gmap_r, fmap1, fmap2, coords, cell_valid,
            jnp.int32(n), slotmap, r, 3, interpret=True,
        )

        # flat oracle
        ii = jnp.asarray(np.broadcast_to(i[:, :, None], (NI, T, M)).reshape(-1))
        jj = jnp.asarray(np.broadcast_to(j[:, :, None], (NI, T, M)).reshape(-1))
        m_ = np.broadcast_to(np.arange(M)[None, None, :], (NI, T, M)).reshape(-1)
        v = np.broadcast_to(np.asarray(cell_valid)[:, :, None],
                            (NI, T, M)).reshape(-1)
        L = 64
        slot_j = jnp.clip(slotmap[jnp.clip(jj, 0, L - 1)], 0, MEM - 1)
        gslot = jnp.clip(slotmap[jnp.clip(ii, 0, L - 1)], 0, MEM - 1)
        gidx = gslot * M + jnp.asarray(m_)
        cflat = coords.reshape(-1, P, P, 2)
        a1 = corr(gmap_r.reshape(MEM * M, P, P, C), fmap1, cflat, gidx, slot_j, 3)
        a2 = corr(gmap_r.reshape(MEM * M, P, P, C), fmap2, cflat / 4.0,
                  gidx, slot_j, 3)
        scale = float(jnp.abs(a1).max())
        vb = jnp.asarray(v)[:, None, None, None]
        d1 = float(jnp.abs(jnp.where(vb, a1 - c1, 0.0)).max())
        d2 = float(jnp.abs(jnp.where(vb, a2 - c2, 0.0)).max())
        assert d1 / scale < 5e-3, d1
        assert d2 / scale < 5e-3, d2

        # the fused stacked finish == corr_stack of the per-level outputs
        from rampvo_tpu.ops.corr import corr_stack

        st = corr_lattice2_stacked(
            gmap_r, fmap1, fmap2, coords, cell_valid,
            jnp.int32(n), slotmap, r, 3, interpret=True,
        )
        ref = corr_stack(c1, c2)
        vb2 = jnp.asarray(v)[:, None]
        ds = float(jnp.abs(jnp.where(
            vb2, st.astype(jnp.float32) - ref, 0.0)).max())
        assert ds / scale < 2e-2, ds
        assert bool(jnp.isfinite(st.astype(jnp.float32)).all())

    def test_fused2_matches_stacked_reference(self):
        """corr_lattice_fused2 (the production TPU kernel, paired layout)
        == corr_lattice2_stacked (the interpret reference, stacked layout)
        mapped through paired_corr_perm, for valid edges."""
        from rampvo_tpu.ops.corr_pallas import (
            corr_lattice_fused2,
            paired_corr_perm,
        )

        rng = np.random.RandomState(11)
        NI, T, M, P, C = 4, 5, 8, 3, 128
        MEM, H, W = 5, 40, 48
        r = (T + 1) // 2
        n = 6
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
        cell_valid = jnp.asarray(
            (i >= 0) & (j >= 0) & (j <= n - 1) & (rng.rand(NI, T) < 0.8)
        )
        slotmap = np.full(64, -1, np.int32)
        for f in range(max(0, n - MEM + 1), n):
            slotmap[f] = f % MEM
        slotmap = jnp.asarray(slotmap)

        # reference: the stacked interpret kernel, remapped to the paired
        # layout (inverse of what check_layouts_onchip.py does)
        st = np.asarray(corr_lattice2_stacked(
            gmap_r, fmap1, fmap2, coords, cell_valid, jnp.int32(n),
            slotmap, r, 3, interpret=True,
        ), np.float32)
        idx_paired = paired_corr_perm(P, 3)
        a = np.zeros((st.shape[0], len(idx_paired)), np.float32)
        for cix, rc in enumerate(idx_paired):
            if rc >= 0:
                a[:, cix] = st[:, rc]
        scale = float(np.abs(a).max())

        for name, kw in (("default", {}), ("nopin", {"pin_inputs": False})):
            b = corr_lattice_fused2(
                gmap_r, fmap1, fmap2, coords, cell_valid, jnp.int32(n),
                slotmap, r, 3, interpret=True, **kw,
            ).astype(jnp.float32)
            assert bool(jnp.isfinite(b).all())
            # compare only the real-window lanes (paired layout has dead
            # lanes where idx_paired < 0; fused2 zeroes them via `good`)
            live = np.asarray(idx_paired) >= 0
            d = float(np.abs((np.asarray(b) - a)[:, live]).max())
            assert d / scale < 1e-2, (name, d / scale)

        # PLANAR coords interface (the production runtime path) must match
        # the interleaved one exactly — same scalar tables, same kernel
        NC = NI * T
        MPP = M * P * P
        u = coords[..., 0].reshape(NC, MPP)
        v = coords[..., 1].reshape(NC, MPP)
        uc = coords[:, :, :, P // 2, P // 2, 0].reshape(NC, M)
        vc = coords[:, :, :, P // 2, P // 2, 1].reshape(NC, M)
        bi = corr_lattice_fused2(
            gmap_r, fmap1, fmap2, coords, cell_valid, jnp.int32(n),
            slotmap, r, 3, interpret=True,
        ).astype(jnp.float32)
        bp = corr_lattice_fused2(
            gmap_r, fmap1, fmap2, (u, v, uc, vc), cell_valid, jnp.int32(n),
            slotmap, r, 3, interpret=True, lat=(NI, T, M, P),
        ).astype(jnp.float32)
        np.testing.assert_array_equal(np.asarray(bi), np.asarray(bp))

    @pytest.mark.slow
    def test_folded_layout_permutation(self):
        """folded=True output + folded_corr_perm == reference stacked layout
        (so folding the permutation into corr_fc1's kernel is exact)."""
        from rampvo_tpu.ops.corr_pallas import folded_corr_perm

        rng = np.random.RandomState(5)
        NI, T, M, P, C = 3, 5, 8, 3, 128
        MEM, H, W = 4, 40, 64
        r = (T + 1) // 2
        n = 6
        gmap_r = jnp.asarray(rng.rand(MEM, M, P, P, C), jnp.float32)
        fmap1 = jnp.asarray(rng.rand(MEM, H, W, C), jnp.float32)
        fmap2 = jnp.asarray(rng.rand(MEM, H // 4, W // 4, C), jnp.float32)
        coords = jnp.asarray(
            rng.rand(NI, T, M, P, P, 2) * np.array([W, H]), jnp.float32
        )
        i_row = np.arange(NI)[:, None]
        tt = np.arange(T)[None, :]
        i = n - 1 - np.mod(n - 1 - i_row, NI) + 0 * tt
        j = i + tt - (r - 1)
        cell_valid = jnp.asarray((i >= 0) & (j >= 0) & (j <= n - 1))
        slotmap = jnp.asarray(rng.randint(0, MEM, 64), jnp.int32)

        ref = corr_lattice2_stacked(
            gmap_r, fmap1, fmap2, coords, cell_valid,
            jnp.int32(n), slotmap, r, 3, interpret=True,
        )
        fol = corr_lattice2_stacked(
            gmap_r, fmap1, fmap2, coords, cell_valid,
            jnp.int32(n), slotmap, r, 3, interpret=True, folded=True,
        )
        inv = folded_corr_perm(3, 3)
        # column `fc` of folded equals column inv[fc] of reference
        np.testing.assert_array_equal(
            np.asarray(fol), np.asarray(ref)[:, inv]
        )
        # and a Dense with permuted kernel gives identical outputs
        W1 = rng.rand(882, 16).astype(np.float32)
        a = np.asarray(ref, np.float32) @ W1
        b = np.asarray(fol, np.float32) @ W1[inv]
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-4)


class TestFused4:

    def _problem(self, seed, n, NI=4, T=5, M=8, P=3, C=128, MEM=5,
                 H=40, W=48, holes=True):
        rng = np.random.RandomState(seed)
        r = (T + 1) // 2
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
        cv = (i >= 0) & (j >= 0) & (j <= n - 1)
        if holes:
            cv = cv & (rng.rand(NI, T) < 0.8)
        slotmap = np.full(64, -1, np.int32)
        for f in range(max(0, n - MEM + 1), n):
            slotmap[f] = f % MEM
        return (gmap_r, fmap1, fmap2, coords, jnp.asarray(cv),
                jnp.int32(n), jnp.asarray(slotmap), r)

    @pytest.mark.parametrize("n", [6, 3, 2])
    def test_fused4_matches_fused3(self, n):
        """The cell-batched kernel == fused3 bit-for-bit on every valid
        edge (same tiles, same dot/roll/blend chain — only the grid
        decomposition and output routing differ), incl. early-sequence
        partial lattices and cell_valid holes."""
        from rampvo_tpu.ops.corr_pallas import (
            corr_lattice_fused3,
            corr_lattice_fused4,
        )

        args = self._problem(21 + n, n)
        a = corr_lattice_fused3(*args, 3, interpret=True)
        b = corr_lattice_fused4(*args, 3, interpret=True)
        assert bool(jnp.isfinite(b.astype(jnp.float32)).all())
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # planar coords interface == interleaved (production path)
        g, f1, f2, coords, cv, nn, sm, r = args
        NI, T, M, P = coords.shape[:4]
        NC, MPP = NI * T, M * P * P
        u = coords[..., 0].reshape(NC, MPP)
        v = coords[..., 1].reshape(NC, MPP)
        uc = coords[:, :, :, P // 2, P // 2, 0].reshape(NC, M)
        vc = coords[:, :, :, P // 2, P // 2, 1].reshape(NC, M)
        bp = corr_lattice_fused4(
            g, f1, f2, (u, v, uc, vc), cv, nn, sm, r, 3, interpret=True,
            lat=(NI, T, M, P),
        )
        np.testing.assert_array_equal(np.asarray(b), np.asarray(bp))

    def test_fused4_tband_split(self):
        """A t-band smaller than T (multiple grid steps per target, bands
        straddling the live range) changes nothing."""
        from rampvo_tpu.ops.corr_pallas import corr_lattice_fused4

        args = self._problem(7, 6)
        a = corr_lattice_fused4(*args, 3, interpret=True, tb=2)
        b = corr_lattice_fused4(*args, 3, interpret=True, tb=13)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused3_gang32_matches_gang16():
    """M % 32 == 0 engages the 32-edge gang (production bench shapes);
    its output must equal the 16-edge gang bit-for-bit (same math, bigger
    in-register blocks)."""
    from rampvo_tpu.ops.corr_pallas import corr_lattice_fused3

    rng = np.random.RandomState(3)
    NI, T, M, P, C = 3, 5, 32, 3, 128
    MEM, H, W = 4, 40, 48
    r = (T + 1) // 2
    n = 5
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
    cv = jnp.asarray((i >= 0) & (j >= 0) & (j <= n - 1))
    slotmap = jnp.asarray(np.arange(64) % MEM, jnp.int32)

    a = corr_lattice_fused3(gmap_r, fmap1, fmap2, coords, cv, jnp.int32(n),
                            slotmap, r, 3, interpret=True)

    # force the 16-gang by splitting M into two 16-wide halves is not
    # equivalent (edges interleave) — instead compare against fused2,
    # whose gang logic is independent
    from rampvo_tpu.ops.corr_pallas import corr_lattice_fused2

    b = corr_lattice_fused2(gmap_r, fmap1, fmap2, coords, cv, jnp.int32(n),
                            slotmap, r, 3, interpret=True)
    # fused3's level-2 small tile (SPREAD2_S=1) differs from fused2's only
    # out of spread; this synthetic stays in-spread -> near-exact
    sa = np.asarray(a, np.float32)
    sb = np.asarray(b, np.float32)
    scale = max(np.abs(sb).max(), 1e-6)
    assert np.abs(sa - sb).max() / scale < 1e-2
