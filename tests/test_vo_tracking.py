"""Runtime-correctness tracking test: with ground-truth update targets the
full VO loop (edge graph + BA + keyframing + terminate) must recover the
camera trajectory up to the monocular gauge.

Isolates the SLAM state machine from network quality — this is the runtime
analogue of the reference's ATE integration test (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import synthetic
from rampvo_tpu.lie import ops as lops
from rampvo_tpu.models import VONet
from rampvo_tpu.models.encoders import MultiScaleEncoder
from rampvo_tpu.utils import ate_rmse
from rampvo_tpu.vo import VOConfig
from rampvo_tpu.vo.runtime import make_final_updates, make_vo_frame
from rampvo_tpu.vo.state import init_state

pytestmark = pytest.mark.slow

H, W = 60, 80
N_FRAMES = 18


@pytest.mark.parametrize(
    "ow,pl,rw,finals,tol",
    [
        # full windows: the solver must recover the trajectory EXACTLY
        (20, 17, 20, 30, 1e-3),
        # toy sliding window: early poses freeze before enough evidence
        # arrives; bounded drift is the expected SLAM behavior
        (6, 5, 8, 12, 0.2),
    ],
)
def test_oracle_targets_recover_trajectory(ow, pl, rw, finals, tol):
    # ground-truth camera-to-world poses on the curved path
    images, poses_c2w, intr = synthetic.render_sequence(
        N_FRAMES, H, W, motion="curve"
    )
    gt_w2c = np.asarray(lops.se3_inv(jnp.asarray(poses_c2w, jnp.float32)))
    gt_w2c_j = jnp.asarray(gt_w2c)

    def true_disp(x, y):
        """Non-planar synthetic depth field: a single plane is a degenerate
        configuration (pose/depth homography family fits any planar target
        set exactly), so the oracle uses smooth depth variation instead."""
        return 0.35 + 0.2 * jnp.sin(x / 6.0) * jnp.cos(y / 5.0)

    cfg = VOConfig(
        BUFFER_SIZE=64, MAX_FRAMES=64, PATCHES_PER_FRAME=16,
        REMOVAL_WINDOW=rw, OPTIMIZATION_WINDOW=ow, PATCH_LIFETIME=pl,
        KEYFRAME_INDEX=2, KEYFRAME_THRESH=0.0,  # never evict (clean check)
        MIXED_PRECISION=False, PROBE_THRESH=-1.0, MEM=32,
    )
    M = cfg.M

    def oracle(state, ii, jj, kk, coords):
        """GT target = true patch pixel reprojected through GT poses with
        the true inverse depth; delta = target - current estimate."""
        L = state.l2g.shape[0]
        F = state.poses.shape[0]
        gi = state.l2g[jnp.clip(ii, 0, L - 1)]  # global id == frame index
        gj = state.l2g[jnp.clip(jj, 0, L - 1)]
        rows = jnp.clip(
            state.l2g[jnp.clip(kk // M, 0, L - 1)] * M + kk % M,
            0, F * M - 1,
        )
        # true patch geometry: extraction pixel coords + true inverse depth
        centers = state.patches[rows][:, :, 1, 1].copy()
        x = centers[:, 0]
        y = centers[:, 1]
        fx, fy, cx, cy = state.intrinsics
        X0 = jnp.stack(
            [(x - cx) / fx, (y - cy) / fy, jnp.ones_like(x),
             true_disp(x, y)], -1
        )
        gmax = gt_w2c_j.shape[0] - 1
        Gi = gt_w2c_j[jnp.clip(gi, 0, gmax)]
        Gj = gt_w2c_j[jnp.clip(gj, 0, gmax)]
        Gij = lops.se3_mul(Gj, lops.se3_inv(Gi))
        X1 = lops.se3_act4(Gij, X0)
        Z = jnp.maximum(X1[:, 2], 0.1)
        tx = fx * X1[:, 0] / Z + cx
        ty = fy * X1[:, 1] / Z + cy
        target = jnp.stack([tx, ty], -1)
        delta = target - coords[:, 1, 1, :]
        weight = jnp.ones_like(delta)
        return delta, weight

    vonet = VONet(input_mode="MultiScale")
    params = vonet.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, H, W, 5)), jnp.zeros((1, H, W, 3)),
        jnp.asarray([True]),
    )
    state = init_state(cfg, MultiScaleEncoder.init_state(H, W), H, W)
    vo_frame = make_vo_frame(cfg, vonet, oracle=oracle)

    rng = np.random.RandomState(0)
    mask = jnp.asarray([True])
    intr_j = jnp.asarray(intr, jnp.float32)
    for t in range(N_FRAMES):
        ev = jnp.asarray(rng.rand(1, H, W, 5), jnp.float32)
        im = jnp.asarray(images[t][None, :, :, None].repeat(3, -1) / 255.0,
                         jnp.float32)
        state = vo_frame(params, state, ev, im, mask, intr_j)

    final = make_final_updates(cfg, vonet, iters=finals, oracle=oracle)
    state = final(params, state)

    assert bool(state.initialized)
    n = int(state.n)
    assert n == N_FRAMES  # KEYFRAME_THRESH=0 -> nothing evicted

    # estimated camera-to-world positions vs ground truth (gauge-aligned)
    est_w2c = np.asarray(state.poses[: N_FRAMES])
    est_c2w = np.asarray(lops.se3_inv(jnp.asarray(est_w2c)))
    ate = ate_rmse(est_c2w[:, :3], poses_c2w[:, :3].astype(np.float32))

    extent = np.linalg.norm(
        poses_c2w[:, :3].max(0) - poses_c2w[:, :3].min(0)
    )
    print(f"oracle-target ATE: {ate:.5f} (trajectory extent {extent:.3f})")
    assert ate < tol * extent, (ate, extent, tol)
