"""Edge-wise geometry + config loading + probe gate behavior."""

import jax.numpy as jnp
import numpy as np

from rampvo_tpu.geometry.projective import (
    flow_mag,
    flow_mag_edges,
    transform,
    transform_edges,
)
from rampvo_tpu.lie import SE3, ops as lops
from rampvo_tpu.vo import VOConfig
import pytest


def _random_setup(seed=0, Np=4, M=10):
    rng = np.random.RandomState(seed)
    poses = lops.se3_exp(jnp.asarray(0.1 * rng.randn(Np, 6), jnp.float32))
    patches = jnp.asarray(
        np.stack(
            [rng.uniform(10, 50, (M, 3, 3)), rng.uniform(10, 40, (M, 3, 3)),
             np.repeat(rng.uniform(0.3, 0.8, (M, 1, 1)), 9).reshape(M, 3, 3)],
            axis=1,
        ),
        jnp.float32,
    )
    intr = jnp.asarray([50.0, 50.0, 30.0, 25.0], jnp.float32)
    ii = jnp.asarray(rng.randint(0, Np, M), jnp.int32)
    jj = jnp.asarray(rng.randint(0, Np, M), jnp.int32)
    kk = jnp.arange(M, dtype=jnp.int32)
    return poses, patches, intr, ii, jj, kk


class TestEdgeGeometry:
    def test_transform_edges_matches_batched_transform(self):
        poses, patches, intr, ii, jj, kk = _random_setup()
        intr_b = jnp.broadcast_to(intr, (1, poses.shape[0], 4))
        want = transform(SE3(poses[None]), patches[None], intr_b, ii, jj, kk)
        got = transform_edges(poses[ii], poses[jj], patches[kk], intr)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want[0]),
                                   atol=1e-4)

    def test_flow_mag_edges_matches_batched(self):
        poses, patches, intr, ii, jj, kk = _random_setup(seed=1)
        intr_b = jnp.broadcast_to(intr, (1, poses.shape[0], 4))
        want = flow_mag(SE3(poses[None]), patches[None], intr_b, ii, jj, kk,
                        beta=0.5)
        got = flow_mag_edges(poses[ii], poses[jj], patches[kk], intr,
                             beta=0.5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want[0]),
                                   atol=1e-3, rtol=1e-3)


class TestVOConfigYaml:
    def test_loads_repo_presets(self, tmp_path):
        cfg = VOConfig.from_yaml("config_vo/default.yaml")
        assert cfg.PATCHES_PER_FRAME == 96
        assert cfg.REMOVAL_WINDOW == 22
        assert cfg.KEYFRAME_THRESH == 15.0

        fast = VOConfig.from_yaml("config_vo/fast.yaml")
        assert fast.PATCHES_PER_FRAME == 48
        assert fast.PATCH_LIFETIME == 11

        sd = VOConfig.from_yaml("config_vo/default_StereoDavis.yaml")
        assert sd.KEYFRAME_THRESH == 5.0
        assert sd.BUFFER_SIZE == 4096

    def test_capacities_scale_with_preset(self):
        small = VOConfig(PATCHES_PER_FRAME=8, PATCH_LIFETIME=3,
                         REMOVAL_WINDOW=5)
        assert small.EDGE_CAPACITY == 8 * 5 * 8
        assert small.PATCH_WINDOW == small.POSE_WINDOW * 8


class TestProbeGate:
    @pytest.mark.slow
    def test_probe_skips_frames_below_threshold(self):
        """With PROBE_THRESH=+inf every pre-init frame after the first is
        skipped (the probe median is always below it): n stays 1 while the
        counter keeps advancing, matching Ramp_vo.py:384-387."""
        import jax

        from rampvo_tpu.models import VONet
        from rampvo_tpu.models.encoders import MultiScaleEncoder
        from rampvo_tpu.vo.runtime import make_vo_frame
        from rampvo_tpu.vo.state import init_state

        H, W = 64, 96
        cfg = VOConfig(
            BUFFER_SIZE=32, MAX_FRAMES=32, PATCHES_PER_FRAME=8,
            REMOVAL_WINDOW=4, OPTIMIZATION_WINDOW=3, PATCH_LIFETIME=3,
            MIXED_PRECISION=False, PROBE_THRESH=1e9, MEM=16,
        )
        vonet = VONet(input_mode="MultiScale")
        params = vonet.init(
            jax.random.PRNGKey(0), jnp.zeros((1, H, W, 5)),
            jnp.zeros((1, H, W, 3)), jnp.asarray([True]),
        )
        state = init_state(cfg, MultiScaleEncoder.init_state(H, W), H, W)
        vo_frame = make_vo_frame(cfg, vonet)

        rng = np.random.RandomState(0)
        mask = jnp.asarray([True])
        intr = jnp.asarray([50.0, 50.0, W / 2, H / 2], jnp.float32)
        for t in range(5):
            ev = jnp.asarray(rng.rand(1, H, W, 5), jnp.float32)
            im = jnp.asarray(rng.rand(1, H, W, 3), jnp.float32)
            state = vo_frame(params, state, ev, im, mask, intr)

        assert int(state.n) == 1          # everything after frame 0 skipped
        assert int(state.counter) == 5    # but all frames got trajectory ids
        assert not bool(state.initialized)
        # skipped frames recorded as identity deltas to their predecessor
        parents = np.asarray(state.delta_parent[:5])
        np.testing.assert_array_equal(parents[1:], [0, 1, 2, 3])
