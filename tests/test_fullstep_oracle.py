"""Full-step numeric oracle: one complete VO update step vs the reference.

Composes the repo's per-module oracles into ONE end-to-end check of
`vo/runtime._update` (ref: ramp/Ramp_vo.py:276-310): a real VO state is
built by driving 9 frames through the production runtime, then a single
update step — reproject -> two-level correlation -> update operator ->
2x Gauss-Newton BA — is verified stage by stage against independent
implementations:

  reproject   scipy-Rotation quaternion math (ref: projective_ops.py:50-65)
  corr        the numpy transliteration of correlation_kernel.cu semantics
              (tests/test_ops.oracle_corr) + the reference stacking order
              (net.py:229: level is the fastest-varying axis)
  update op   the plain-torch oracle of ramp/net.py:34-90
              (tests/test_update_parity.torch_update_oracle)
  BA          a float64 numpy Gauss-Newton with FINITE-DIFFERENCE Jacobians
              and the fastba gates/damping/retraction semantics
              (ref: ba_cuda.cu:232-376,533-565,218-222)

This is the strongest parity statement available without the published
checkpoints (VERDICT r02 "what's missing" #1): it catches cross-module
wiring drift (index remapping, window construction, target/weight
plumbing) that the per-module tests cannot.
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rampvo_tpu.ckpt import map_state_dict
from rampvo_tpu.models import VONet
from rampvo_tpu.vo import RampVO, VOConfig
from rampvo_tpu.vo.runtime import (
    _edge_corr_ctx,
    _reproject_edges,
    _update,
)
from rampvo_tpu.vo.state import edge_table

from test_ops import oracle_corr
from test_update_parity import make_torch_state_dict, torch_update_oracle

torch = pytest.importorskip("torch")
scipy_rot = pytest.importorskip("scipy.spatial.transform")

pytestmark = pytest.mark.slow

H, W = 64, 96
M = 8
CFG = VOConfig(
    BUFFER_SIZE=64,
    PATCHES_PER_FRAME=M,
    REMOVAL_WINDOW=5,
    OPTIMIZATION_WINDOW=4,
    PATCH_LIFETIME=3,
    KEYFRAME_INDEX=2,
    KEYFRAME_THRESH=0.0,   # never evict: l2g stays identity for the oracle
    MIXED_PRECISION=False,
    PROBE_THRESH=-1.0,
    CORR_IMPL="xla",       # exact XLA path (CPU-runnable)
    MAX_FRAMES=64,
    MEM=16,
)
DIM = 384


# ---------------------------------------------------------------------------
# independent SE3 helpers (scipy quaternions, float64)
# ---------------------------------------------------------------------------

def _R(q):
    return scipy_rot.Rotation.from_quat(np.asarray(q, np.float64))


def se3_mul_np(a, b):
    ta, qa = a[:3], a[3:]
    tb, qb = b[:3], b[3:]
    Ra, Rb = _R(qa), _R(qb)
    return np.concatenate([Ra.apply(tb) + ta, (Ra * Rb).as_quat()])


def se3_inv_np(g):
    t, q = g[:3], g[3:]
    Ri = _R(q).inv()
    return np.concatenate([-Ri.apply(t), Ri.as_quat()])


def se3_exp_np(xi):
    """exp([tau, phi]) with the standard V(phi) translation map."""
    tau, phi = np.asarray(xi[:3], np.float64), np.asarray(xi[3:], np.float64)
    th = np.linalg.norm(phi)
    q = scipy_rot.Rotation.from_rotvec(phi).as_quat()
    K = np.array([
        [0, -phi[2], phi[1]],
        [phi[2], 0, -phi[0]],
        [-phi[1], phi[0], 0],
    ])
    if th < 1e-8:
        V = np.eye(3) + 0.5 * K
    else:
        V = (
            np.eye(3)
            + ((1 - np.cos(th)) / th**2) * K
            + ((th - np.sin(th)) / th**3) * (K @ K)
        )
    return np.concatenate([V @ tau, q])


def project_np(pose_i, pose_j, center, intr):
    """Reproject one patch center (ref: projective_ops.py:16-65).
    center = (x, y, inverse depth). Returns (coords [2], Z)."""
    fx, fy, cx, cy = intr
    Gij = se3_mul_np(pose_j, se3_inv_np(pose_i))
    x, y, d = center
    X0 = np.array([(x - cx) / fx, (y - cy) / fy, 1.0], np.float64)
    X1 = _R(Gij[3:]).apply(X0) + d * Gij[:3]
    Z = X1[2]
    Zc = max(Z, 0.1)  # projection clamp (projective_ops.py:40)
    return np.array([fx * X1[0] / Zc + cx, fy * X1[1] / Zc + cy]), Z


# ---------------------------------------------------------------------------
# fixture: a real post-init VO state + torch-shared update weights
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def setup():
    vo = RampVO(CFG, None, input_mode="MultiScale", ht=H, wd=W)
    params = vo.vonet.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, H, W, 5)),
        jnp.zeros((1, H, W, 3)),
        jnp.asarray([True]),
    )
    # share the UPDATE operator weights with the torch oracle through the
    # checkpoint importer (the same path the published .pth files take)
    sd = make_torch_state_dict(seed=7)
    mapped, _ = map_state_dict(
        {k: v.numpy() for k, v in sd.items()}, "MultiScale"
    )
    p = dict(params)
    pp = dict(p["params"])
    pp["update"] = mapped["params"]["update"]
    p["params"] = pp
    vo.params = p

    rng = np.random.RandomState(3)
    K = np.asarray([W / 2.0, W / 2.0, W / 2.0, H / 2.0], np.float32)
    for t in range(9):
        ev = jnp.asarray(rng.rand(1, H, W, 5), jnp.float32)
        im = jnp.asarray(rng.rand(1, H, W, 3), jnp.float32)
        vo(t, ev, im, np.asarray([True]), K)
    state = vo.state
    assert int(state.n) == 9 and bool(state.initialized)

    vonet = vo.vonet

    def update_fn(params_, net, ctx, corr_in, ii, jj, kk, valid,
                  lattice=None):
        # mirror of make_vo_frame's update_fn with MIXED_PRECISION=False
        return vonet.apply(
            params_, net, ctx, corr_in, ii, jj, kk, valid, lattice,
            lattice_contig=True, method=VONet.update_op,
        )

    return vo, state, sd, update_fn


def _edges(state):
    ii, jj, kk, valid = edge_table(CFG, int(state.n), state.cell_valid)
    return (np.asarray(ii), np.asarray(jj), np.asarray(kk),
            np.asarray(valid))


def _globals(state, ii, jj, kk):
    l2g = np.asarray(state.l2g)
    gi, gj = l2g[ii], l2g[jj]
    rows = l2g[kk // M] * M + kk % M      # _patch_rows semantics
    return gi, gj, rows


# ---------------------------------------------------------------------------
# stage 1: reprojection
# ---------------------------------------------------------------------------

def test_reproject_matches_scipy(setup):
    vo, state, _, _ = setup
    ii, jj, kk, valid = _edges(state)
    gi, gj, rows = _globals(state, ii, jj, kk)

    coords = np.asarray(_reproject_edges(CFG, state, jnp.asarray(ii),
                                         jnp.asarray(jj), jnp.asarray(kk)))
    poses = np.asarray(state.poses, np.float64)
    patches = np.asarray(state.patches, np.float64)
    intr = np.asarray(state.intrinsics, np.float64)

    sel = np.flatnonzero(valid)[::7]  # spot-check every 7th valid edge
    P = patches.shape[-1]
    for e in sel:
        for py in range(P):
            for px in range(P):
                c = patches[rows[e], :, py, px]
                want, _ = project_np(poses[gi[e]], poses[gj[e]], c, intr)
                np.testing.assert_allclose(
                    coords[e, py, px], want, atol=2e-3,
                    err_msg=f"edge {e} ({py},{px})",
                )


# ---------------------------------------------------------------------------
# stage 2: two-level correlation + reference stacking
# ---------------------------------------------------------------------------

def test_corr_matches_numpy_oracle(setup):
    vo, state, _, _ = setup
    ii, jj, kk, valid = _edges(state)
    iij, jjj, kkj = jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(kk)
    _target, corr_in, ctx = _edge_corr_ctx(CFG, state, iij, jjj, kkj)
    # _edge_corr_ctx returns only the [E, 2] center targets (planar r04);
    # rebuild the full [E, P, P, 2] window coords for the oracle
    coords = np.asarray(_reproject_edges(CFG, state, iij, jjj, kkj))
    corr_in = np.asarray(corr_in)

    from rampvo_tpu.ops.corr_pallas import RING_PAD

    h4, w4 = state.hw4
    slotmap = np.asarray(state.slotmap)
    fmap1 = np.asarray(
        state.fmap1_r[:, RING_PAD:RING_PAD + h4, RING_PAD:RING_PAD + w4]
    )
    fmap2 = np.asarray(
        state.fmap2_r[
            :, RING_PAD:RING_PAD + h4 // 4, RING_PAD:RING_PAD + w4 // 4
        ]
    )
    P = state.gmap_r.shape[-3]
    gmap = np.asarray(state.gmap_r).reshape(-1, P, P, 128)
    gidx = slotmap[kk // M] * M + kk % M
    slot_j = slotmap[jj]

    sel = np.flatnonzero(valid)[::17]
    c1 = oracle_corr(gmap, fmap1, coords[sel], gidx[sel], slot_j[sel], 3)
    c2 = oracle_corr(gmap, fmap2, coords[sel] / 4.0, gidx[sel],
                     slot_j[sel], 3)
    # reference stacking: level fastest (net.py:229 / Ramp_vo.py:182)
    want = np.stack([c1, c2], axis=-1).reshape(len(sel), -1)
    np.testing.assert_allclose(corr_in[sel], want, atol=2e-3, rtol=1e-3)


# ---------------------------------------------------------------------------
# stage 3: update operator on the live state
# ---------------------------------------------------------------------------

def test_update_op_matches_torch(setup):
    vo, state, sd, update_fn = setup
    ii, jj, kk, valid = _edges(state)
    iij, jjj, kkj = jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(kk)
    coords, corr_in, ctx = _edge_corr_ctx(CFG, state, iij, jjj, kkj)
    net_flat = state.net.reshape(-1, DIM)

    net2, (delta, weight) = update_fn(
        vo.params, net_flat, ctx, corr_in, iij, jjj, kkj,
        jnp.asarray(valid), None,
    )

    v = np.flatnonzero(valid)
    with torch.no_grad():
        net_t, delta_t, weight_t = torch_update_oracle(
            sd,
            torch.from_numpy(np.asarray(net_flat)[v]),
            torch.from_numpy(np.asarray(ctx)[v]),
            torch.from_numpy(np.asarray(corr_in)[v]),
            torch.from_numpy(ii[v].astype(np.int64)),
            torch.from_numpy(jj[v].astype(np.int64)),
            torch.from_numpy(kk[v].astype(np.int64)),
        )
    np.testing.assert_allclose(np.asarray(net2)[v], net_t.numpy(),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(delta)[v], delta_t.numpy(),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(weight)[v], weight_t.numpy(),
                               atol=1e-3, rtol=1e-3)


# ---------------------------------------------------------------------------
# stage 4: BA + the composed _update step
# ---------------------------------------------------------------------------

def _oracle_ba(poses, depths, patch_xy, edges, target, weight, intr,
               t0, n, l2g, iters=2, lmbda=1e-4):
    """fastba-semantics GN with finite-difference Jacobians (float64).

    poses [F,7] (modified copy returned); depths dict {global patch row: d};
    edges (ii, jj, kk_logical, rows) with logical frame indices.
    Gates/damping/retraction per ba_cuda.cu:296-308,556,218-222.
    """
    poses = poses.copy()
    depths = dict(depths)
    ii, jj, rows = edges
    free = list(range(t0, n))
    pidx = {t: a for a, t in enumerate(free)}
    N6 = 6 * len(free)
    krows = sorted(set(rows.tolist()))
    kidx = {r: a for a, r in enumerate(krows)}
    Mo = len(krows)
    fx, fy, cx, cy = intr
    eps = 1e-6

    for _ in range(iters):
        B = np.zeros((N6, N6))
        Ev = np.zeros((N6, Mo))
        C = np.zeros(Mo)
        v = np.zeros(N6)
        u = np.zeros(Mo)
        touched = np.zeros(Mo)

        for e in range(len(ii)):
            gi, gj = l2g[ii[e]], l2g[jj[e]]
            row = rows[e]
            cen = (patch_xy[row][0], patch_xy[row][1], depths[row])
            c0, Z = project_np(poses[gi], poses[gj], cen, intr)
            r = target[e] - c0
            gate = (
                np.linalg.norm(r) < 128.0 and Z > 0.2
                and -64.0 < c0[0] < 2 * cx + 64.0
                and -64.0 < c0[1] < 2 * cy + 64.0
            )
            if not gate:
                continue
            w2 = weight[e].astype(np.float64)

            def proj_with(pi, pj, d):
                c, _ = project_np(pi, pj, (cen[0], cen[1], d), intr)
                return c

            Ji = np.zeros((2, 6))
            Jj = np.zeros((2, 6))
            for a in range(6):
                dx = np.zeros(6)
                dx[a] = eps
                Ji[:, a] = (
                    proj_with(se3_mul_np(se3_exp_np(dx), poses[gi]),
                              poses[gj], cen[2])
                    - proj_with(se3_mul_np(se3_exp_np(-dx), poses[gi]),
                                poses[gj], cen[2])
                ) / (2 * eps)
                Jj[:, a] = (
                    proj_with(poses[gi],
                              se3_mul_np(se3_exp_np(dx), poses[gj]), cen[2])
                    - proj_with(poses[gi],
                                se3_mul_np(se3_exp_np(-dx), poses[gj]),
                                cen[2])
                ) / (2 * eps)
            Jz = (
                proj_with(poses[gi], poses[gj], cen[2] + eps)
                - proj_with(poses[gi], poses[gj], cen[2] - eps)
            ) / (2 * eps)

            k = kidx[row]
            touched[k] += w2.sum()
            slots = [(pidx.get(ii[e]), Ji), (pidx.get(jj[e]), Jj)]
            for s, J in slots:
                if s is None:
                    continue
                v[6 * s:6 * s + 6] += J.T @ (w2 * r)
                Ev[6 * s:6 * s + 6, k] += J.T @ (w2 * Jz)
                for s2, J2 in slots:
                    if s2 is None:
                        continue
                    B[6 * s:6 * s + 6, 6 * s2:6 * s2 + 6] += (
                        J.T @ (w2[:, None] * J2)
                    )
            C[k] += (w2 * Jz) @ Jz
            u[k] += (w2 * Jz) @ r

        Q = 1.0 / (C + lmbda)
        S = B - Ev @ (Q[:, None] * Ev.T)
        y = v - Ev @ (Q * u)
        di = np.diag_indices(N6)
        S[di] += 1e-4 * S[di] + 1.0         # ba_cuda.cu:556 damping
        dX = np.linalg.solve(S, y)
        dZ = Q * (u - Ev.T @ dX)

        for a, t in enumerate(free):
            poses[l2g[t]] = se3_mul_np(
                se3_exp_np(dX[6 * a:6 * a + 6]), poses[l2g[t]]
            )
        for row, k in kidx.items():
            if touched[k] > 0:
                nd = depths[row] + dZ[k]
                nd = 1.0 if nd > 20.0 else nd     # ba_cuda.cu:218-222
                depths[row] = max(nd, 1e-4)
    return poses, depths


def test_full_update_step_matches_oracle(setup):
    vo, state, sd, update_fn = setup
    n = int(state.n)
    ii, jj, kk, valid = _edges(state)
    gi_, gj_, rows = _globals(state, ii, jj, kk)

    # ---- production: the real composed step ----
    new_state = jax.jit(
        functools.partial(_update, CFG, update_fn)
    )(vo.params, state)

    # ---- recompute the production target/weight (same deterministic fns
    # _update calls) and check last_weight wiring ----
    iij, jjj, kkj = jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(kk)
    center, corr_in, ctx = _edge_corr_ctx(CFG, state, iij, jjj, kkj)
    _, (delta, weight) = update_fn(
        vo.params, state.net.reshape(-1, DIM), ctx, corr_in,
        iij, jjj, kkj, jnp.asarray(valid), None,
    )
    target = np.asarray(center) + np.asarray(delta)
    h4, w4 = state.hw4
    wgt = np.asarray(weight).copy()
    ok = (
        (target[:, 0] >= 0) & (target[:, 0] <= w4)
        & (target[:, 1] >= 0) & (target[:, 1] <= h4)
    )
    wgt[~ok] = 0.0
    wgt[~valid] = 0.0
    np.testing.assert_allclose(
        np.asarray(new_state.last_weight).reshape(-1, 2), wgt,
        atol=1e-5, err_msg="last_weight wiring",
    )

    # ---- oracle BA on the same target/weight ----
    v = np.flatnonzero(valid)
    l2g = np.asarray(state.l2g)
    poses0 = np.asarray(state.poses, np.float64)
    patches0 = np.asarray(state.patches, np.float64)
    patch_xy = {
        int(r): (patches0[r, 0, 1, 1], patches0[r, 1, 1, 1])
        for r in np.unique(rows[v])
    }
    depths0 = {int(r): patches0[r, 2, 1, 1] for r in np.unique(rows[v])}
    t0 = max(n - CFG.OPTIMIZATION_WINDOW, 1)
    poses_o, depths_o = _oracle_ba(
        poses0, depths0, patch_xy,
        (ii[v], jj[v], rows[v]),
        target[v].astype(np.float64), wgt[v],
        np.asarray(state.intrinsics, np.float64),
        t0, n, l2g, iters=CFG.BA_ITERS,
    )

    # ---- compare poses of every live logical frame ----
    new_poses = np.asarray(new_state.poses)
    for t in range(n):
        np.testing.assert_allclose(
            new_poses[l2g[t]], poses_o[l2g[t]], atol=5e-4,
            err_msg=f"pose of logical frame {t}",
        )
    # fixed frames must not move
    for t in range(t0):
        np.testing.assert_allclose(
            new_poses[l2g[t]], poses0[l2g[t]], atol=0,
            err_msg=f"fixed frame {t} moved",
        )

    # ---- compare updated inverse depths ----
    # atol 2e-3: weakly-constrained patches (tiny curvature C) amplify the
    # f32-vs-f64 solver noise through Q = 1/(C + lambda); a wiring error
    # would be O(0.1)
    new_patches = np.asarray(new_state.patches)
    for r, d_o in depths_o.items():
        np.testing.assert_allclose(
            new_patches[r, 2, 1, 1], d_o, atol=2e-3,
            err_msg=f"depth of patch row {r}",
        )
