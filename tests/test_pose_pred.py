"""Pose-prediction (future-pose extrapolation) correctness test.

Drives the oracle-target VO on the synthetic curved trajectory, then
extrapolates future poses with the spline predictor
(vo/pose_prediction.py, ref: ramp/pose_prediction/pose_pred_utils.py) and
checks the predictions against ground truth — they must beat the pure
damped-linear motion-bootstrap baseline (pose_pred_utils.py:189-198) over
the horizon.
"""

import jax
import jax.numpy as jnp
import numpy as np

import synthetic
from rampvo_tpu.lie import ops as lops
from rampvo_tpu.models import VONet
from rampvo_tpu.models.encoders import MultiScaleEncoder
from rampvo_tpu.vo import RampVO, VOConfig
from rampvo_tpu.vo.pose_prediction import motion_bootstrap
from rampvo_tpu.vo.runtime import make_vo_frame
import pytest

H, W = 60, 80
N_FRAMES = 14
HORIZON = 3


def _make_oracle(gt_w2c_j, M):
    def true_disp(x, y):
        return 0.35 + 0.2 * jnp.sin(x / 6.0) * jnp.cos(y / 5.0)

    def oracle(state, ii, jj, kk, coords):
        L = state.l2g.shape[0]
        F = state.poses.shape[0]
        gi = state.l2g[jnp.clip(ii, 0, L - 1)]
        gj = state.l2g[jnp.clip(jj, 0, L - 1)]
        rows = jnp.clip(
            state.l2g[jnp.clip(kk // M, 0, L - 1)] * M + kk % M, 0, F * M - 1
        )
        centers = state.patches[rows][:, :, 1, 1]
        x, y = centers[:, 0], centers[:, 1]
        fx, fy, cx, cy = state.intrinsics
        X0 = jnp.stack(
            [(x - cx) / fx, (y - cy) / fy, jnp.ones_like(x),
             true_disp(x, y)], -1
        )
        gmax = gt_w2c_j.shape[0] - 1
        Gij = lops.se3_mul(
            gt_w2c_j[jnp.clip(gj, 0, gmax)],
            lops.se3_inv(gt_w2c_j[jnp.clip(gi, 0, gmax)]),
        )
        X1 = lops.se3_act4(Gij, X0)
        Z = jnp.maximum(X1[:, 2], 0.1)
        target = jnp.stack(
            [fx * X1[:, 0] / Z + cx, fy * X1[:, 1] / Z + cy], -1
        )
        return target - coords[:, 1, 1, :], jnp.ones_like(target)

    return oracle


@pytest.mark.slow
def test_spline_prediction_beats_motion_bootstrap():
    images, poses_c2w, intr = synthetic.render_sequence(
        N_FRAMES + HORIZON, H, W, motion="curve"
    )
    gt_w2c = np.asarray(
        lops.se3_inv(jnp.asarray(poses_c2w, jnp.float32))
    )
    gt_w2c_j = jnp.asarray(gt_w2c)

    cfg = VOConfig(
        BUFFER_SIZE=64, MAX_FRAMES=64, PATCHES_PER_FRAME=16,
        REMOVAL_WINDOW=20, OPTIMIZATION_WINDOW=20, PATCH_LIFETIME=12,
        KEYFRAME_INDEX=2, KEYFRAME_THRESH=0.0,
        MIXED_PRECISION=False, PROBE_THRESH=-1.0, MEM=32,
    )
    M = cfg.M
    oracle = _make_oracle(gt_w2c_j, M)

    vonet = VONet(input_mode="MultiScale")
    params = vonet.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, H, W, 5)), jnp.zeros((1, H, W, 3)),
        jnp.asarray([True]),
    )
    slam = RampVO(cfg, params, input_mode="MultiScale", ht=H, wd=W)
    # oracle-target update instead of the (random-weight) network
    slam._vo_frame = make_vo_frame(cfg, slam.vonet, oracle=oracle)

    rng = np.random.RandomState(0)
    intr_j = np.asarray(intr, np.float32)
    for t in range(N_FRAMES):
        ev = jnp.asarray(rng.rand(1, H, W, 5), jnp.float32)
        im = jnp.asarray(
            images[t][None, :, :, None].repeat(3, -1) / 255.0, jnp.float32
        )
        slam(t, ev, im, np.asarray([True]), intr_j)
    assert bool(slam.state.initialized)
    n0 = int(slam.state.n)
    assert n0 == N_FRAMES

    # baseline: damped-linear bootstrap iterated over the horizon
    est = np.asarray(slam.state.poses)
    l2g = np.asarray(slam.state.l2g)
    p1, p2 = est[l2g[n0 - 1]], est[l2g[n0 - 2]]
    base_err, pred_err = [], []
    bp1, bp2 = p1, p2
    for k in range(1, HORIZON + 1):
        nxt = motion_bootstrap(bp1, bp2, cfg.MOTION_DAMPING)
        bp2, bp1 = bp1, nxt
        gt_t = np.asarray(
            lops.se3_inv(jnp.asarray(gt_w2c[N_FRAMES - 1 + k])[None])
        )[0, :3]
        est_t = np.asarray(lops.se3_inv(jnp.asarray(nxt)[None]))[0, :3]
        base_err.append(np.linalg.norm(est_t - gt_t))

    last_kf = n0
    for k in range(1, HORIZON + 1):
        pose = slam.predict_future_pose(
            sec_to_pred_future=k, abs_time=N_FRAMES - 1 + k,
            last_keyframe_number=last_kf, deg=2, frequency=1.0,
        )
        gt_t = np.asarray(
            lops.se3_inv(jnp.asarray(gt_w2c[N_FRAMES - 1 + k])[None])
        )[0, :3]
        est_t = np.asarray(lops.se3_inv(jnp.asarray(pose)[None]))[0, :3]
        pred_err.append(np.linalg.norm(est_t - gt_t))

    base = float(np.sum(base_err))
    pred = float(np.sum(pred_err))
    print(f"pose-pred horizon err: spline={pred:.4f} bootstrap={base:.4f}")
    assert np.isfinite(pred)
    assert pred <= base * 1.05, (pred, base)
