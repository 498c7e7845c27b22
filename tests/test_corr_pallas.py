"""Pallas correlation kernels vs the exact XLA formulation (interpret mode).

The kernels' contract: exact match for patch pixels within SPREAD px of
their patch center (realistic geometry — patch depth is constant per patch);
farther pixels get zeroed windows (see ops/corr_pallas.py docstring).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rampvo_tpu.ops.corr import corr
from rampvo_tpu.ops.corr_pallas import corr_pallas, corr_pallas2


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


class TestCorrPallas:
    def test_single_level_matches_xla(self):
        gmap, fmap1, _, coords, ii, jj = make_problem()
        a = corr(gmap, fmap1, coords, ii, jj, 3)
        b = corr_pallas(gmap, fmap1, coords, ii, jj, 3, interpret=True)
        scale = float(jnp.abs(a).max())
        assert float(jnp.abs(a - b).max()) / scale < 5e-3  # bf16 output

    def test_fused_two_level_matches_xla(self):
        gmap, fmap1, fmap2, coords, ii, jj = make_problem(seed=1)
        a1 = corr(gmap, fmap1, coords, ii, jj, 3)
        a2 = corr(gmap, fmap2, coords / 4.0, ii, jj, 3)
        b1, b2 = corr_pallas2(
            gmap, fmap1, fmap2, coords, ii, jj, 3, interpret=True
        )
        scale = float(jnp.abs(a1).max())
        assert float(jnp.abs(a1 - b1).max()) / scale < 5e-3
        assert float(jnp.abs(a2 - b2).max()) / scale < 5e-3

    def test_wide_spread_windows_zeroed(self):
        """Pixels beyond SPREAD px from the center get zeroed windows."""
        gmap, fmap1, _, coords, ii, jj = make_problem(seed=2, E=8)
        far = coords.at[:, 0, 0, :].add(30.0)  # blow one pixel's offset
        b = corr_pallas(gmap, fmap1, far, ii, jj, 3, interpret=True)
        a = corr(gmap, fmap1, far, ii, jj, 3)
        # other pixels still match
        np.testing.assert_allclose(
            np.asarray(b[:, 1:, :, :]), np.asarray(a[:, 1:, :, :]),
            atol=5e-3 * float(jnp.abs(a).max()),
        )
