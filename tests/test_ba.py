"""Bundle adjustment tests on synthetic scenes with known minima.

Mirrors the reference's implicit spec: fastba (2-iter GN, ramp/fastba/) and
the differentiable training BA (ramp/ba.py) both minimize center-pixel
reprojection error over a patch graph.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rampvo_tpu.ba import ba_infer, ba_train, linearize_center
from rampvo_tpu.lie import SE3, ops as lops


def make_scene(seed=0, n_frames=4, n_patches=32):
    rng = np.random.RandomState(seed)
    intr = np.array([120.0, 120.0, 160.0, 120.0], np.float32)
    fx, fy, cx, cy = intr

    # ground-truth world-to-camera poses: small motions from identity
    xi = 0.05 * rng.randn(n_frames, 6).astype(np.float32)
    xi[0] = 0
    poses_gt = lops.se3_exp(jnp.asarray(xi))  # [N,7]

    # patches hosted in frame 0: pixel coords + inverse depth
    x = rng.uniform(cx - 100, cx + 100, n_patches).astype(np.float32)
    y = rng.uniform(cy - 80, cy + 80, n_patches).astype(np.float32)
    idepth = rng.uniform(0.25, 1.0, n_patches).astype(np.float32)
    centers = jnp.stack([jnp.asarray(x), jnp.asarray(y), jnp.asarray(idepth)], -1)

    # edges: every patch observed in every other frame
    ii = np.repeat(0, n_patches * (n_frames - 1))
    jj = np.repeat(np.arange(1, n_frames), n_patches)
    kk = np.tile(np.arange(n_patches), n_frames - 1)
    ii, jj, kk = map(lambda a: jnp.asarray(a, jnp.int32), (ii, jj, kk))

    intr_e = jnp.broadcast_to(jnp.asarray(intr), (ii.shape[0], 4))
    targets, Z, *_ = linearize_center(
        poses_gt, centers[kk], intr_e, intr_e, ii, jj
    )
    assert np.all(np.asarray(Z) > 0.2)
    return jnp.asarray(intr), poses_gt, centers, ii, jj, kk, targets


def patches_from_centers(centers, P=3):
    M = centers.shape[0]
    p = jnp.zeros((M, 3, P, P), jnp.float32)
    return p + centers[:, :, None, None]


class TestBAInfer:
    def test_converges_to_gt_poses(self):
        # two poses held fixed (t0=2) to pin the monocular scale gauge
        intr, poses_gt, centers, ii, jj, kk, targets = make_scene()
        M = centers.shape[0]

        rng = np.random.RandomState(1)
        noise = 0.02 * rng.randn(4, 6).astype(np.float32)
        noise[:2] = 0
        poses0 = lops.se3_mul(lops.se3_exp(jnp.asarray(noise)), poses_gt)

        weights = jnp.ones((ii.shape[0], 2), jnp.float32)
        poses1, _d1 = ba_infer(
            poses0,
            centers,
            intr,
            targets,
            weights,
            jnp.float32(1e-4),
            ii,
            jj,
            kk,
            jnp.int32(2),
            jnp.int32(4),
            N=2,
            M=M,
            iterations=10,
        )

        err0 = np.linalg.norm(np.asarray(poses0 - poses_gt))
        err1 = np.linalg.norm(np.asarray(poses1 - poses_gt))
        assert err1 < 0.05 * err0, (err0, err1)

    def test_depth_only_structure(self):
        intr, poses_gt, centers, ii, jj, kk, targets = make_scene(seed=3)
        M = centers.shape[0]
        bad = centers.at[:, 2].mul(1.5)  # corrupt inverse depths

        weights = jnp.ones((ii.shape[0], 2), jnp.float32)
        _, d1 = ba_infer(
            poses_gt,
            bad,
            intr,
            targets,
            weights,
            jnp.float32(1e-5),
            ii,
            jj,
            kk,
            jnp.int32(4),
            jnp.int32(4),  # t0 == t1 -> no free poses
            N=4,
            M=M,
            iterations=10,
            structure_only=True,
        )
        d1 = np.asarray(d1)
        d_gt = np.asarray(centers[:, 2])
        assert np.abs(d1 - d_gt).max() < 1e-2

    def test_invalid_edges_ignored(self):
        intr, poses_gt, centers, ii, jj, kk, targets = make_scene(seed=5)
        M = centers.shape[0]
        E = ii.shape[0]

        weights = jnp.ones((E, 2), jnp.float32)
        args = dict(N=3, M=M, iterations=2)
        poses_a, _ = ba_infer(
            poses_gt, centers, intr, targets, weights,
            jnp.float32(1e-4), ii, jj, kk, jnp.int32(1), jnp.int32(4), **args
        )

        # append garbage edges with valid=False; result must be identical
        pad = 7
        ii2 = jnp.concatenate([ii, jnp.zeros(pad, jnp.int32)])
        jj2 = jnp.concatenate([jj, jnp.full((pad,), 2, jnp.int32)])
        kk2 = jnp.concatenate([kk, jnp.zeros(pad, jnp.int32)])
        tg2 = jnp.concatenate([targets, 1e6 * jnp.ones((pad, 2))])
        wt2 = jnp.concatenate([weights, jnp.ones((pad, 2))])
        vmask = jnp.concatenate([jnp.ones(E, bool), jnp.zeros(pad, bool)])
        poses_b, _ = ba_infer(
            poses_gt, centers, intr, tg2, wt2,
            jnp.float32(1e-4), ii2, jj2, kk2, jnp.int32(1), jnp.int32(4),
            valid=vmask, **args
        )
        np.testing.assert_allclose(np.asarray(poses_a), np.asarray(poses_b), atol=1e-5)

    def test_gauge_first_pose_fixed(self):
        intr, poses_gt, centers, ii, jj, kk, targets = make_scene(seed=7)
        M = centers.shape[0]
        weights = jnp.ones((ii.shape[0], 2), jnp.float32)
        poses1, _ = ba_infer(
            poses_gt, centers, intr, targets, weights,
            jnp.float32(1e-4), ii, jj, kk, jnp.int32(1), jnp.int32(4),
            N=3, M=M, iterations=3,
        )
        np.testing.assert_allclose(
            np.asarray(poses1[0]), np.asarray(poses_gt[0]), atol=1e-7
        )


class TestBATrain:
    def _batched(self, seed=0):
        intr, poses_gt, centers, ii, jj, kk, targets = make_scene(seed=seed)
        intrinsics = jnp.broadcast_to(intr, (1, 4, 4))
        patches = patches_from_centers(centers)[None]
        return intrinsics, poses_gt, patches, ii, jj, kk, targets[None]

    def test_reduces_residual(self):
        intrinsics, poses_gt, patches, ii, jj, kk, targets = self._batched()
        rng = np.random.RandomState(2)
        noise = 0.02 * rng.randn(4, 6).astype(np.float32)
        noise[0] = 0
        poses0 = SE3(lops.se3_mul(lops.se3_exp(jnp.asarray(noise)), poses_gt)[None])

        weights = jnp.ones(targets.shape, jnp.float32)
        bounds = (0.0, 0.0, 320.0, 240.0)

        def resid(poses, ptch):
            intr_e = jnp.broadcast_to(intrinsics[0, 0], (ii.shape[0], 4))
            c, *_ = linearize_center(
                poses.data[0], ptch[0][kk, :, 1, 1], intr_e, intr_e, ii, jj
            )
            return float(jnp.linalg.norm(targets[0] - c))

        p, q = poses0, patches
        for _ in range(4):
            p, q = ba_train(
                p, q, intrinsics, targets, weights, jnp.float32(1e-4),
                ii, jj, kk, bounds, ep=1.0,
            )
        assert resid(p, q) < 0.01 * resid(poses0, patches)

    def test_differentiable(self):
        intrinsics, poses_gt, patches, ii, jj, kk, targets = self._batched(seed=4)
        weights = jnp.ones(targets.shape, jnp.float32)
        bounds = (0.0, 0.0, 320.0, 240.0)

        def loss(tgt):
            p, q = ba_train(
                SE3(poses_gt[None]), patches, intrinsics, tgt, weights,
                jnp.float32(1e-4), ii, jj, kk, bounds,
            )
            return jnp.sum(p.data**2) + jnp.sum(q[..., 2, 1, 1] ** 2)

        g = jax.grad(loss)(targets)
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.abs(np.asarray(g)).max() > 0


class TestLatticeAssembly:
    def test_ba_infer_lattice_matches_flat(self):
        """ba_infer with the dense lattice per-patch reduction must equal the
        segment_sum path on a lattice-ordered edge set."""
        from rampvo_tpu.vo.state import host_of_row

        rng = np.random.RandomState(11)
        NI, T, Mp = 5, 7, 4
        r = (T + 1) // 2
        n = 9
        E = NI * T * Mp
        Nwin, Mwin = 4, 10 * Mp
        base = 0

        # lattice-consistent edges + gaps
        i_row = np.arange(NI)[:, None]
        tt = np.arange(T)[None, :]
        i = n - 1 - np.mod(n - 1 - i_row, NI) + 0 * tt
        j = i + tt - (r - 1)
        cellv = (i >= 0) & (j >= 0) & (j <= n - 1) & (rng.rand(NI, T) < 0.8)
        ii = np.broadcast_to(i[:, :, None], (NI, T, Mp))
        jj = np.broadcast_to(j[:, :, None], (NI, T, Mp))
        m_ = np.broadcast_to(np.arange(Mp)[None, None, :], (NI, T, Mp))
        kk = ii * Mp + m_
        valid = np.broadcast_to(cellv[:, :, None], (NI, T, Mp))
        iif = jnp.asarray(np.where(valid, ii, 0).reshape(E), jnp.int32)
        jjf = jnp.asarray(np.where(valid, jj, 0).reshape(E), jnp.int32)
        kkf = jnp.asarray(np.where(valid, kk, 0).reshape(E), jnp.int32)
        vf = jnp.asarray(valid.reshape(E))

        poses = jnp.asarray(
            np.concatenate(
                [0.02 * rng.randn(n, 6).astype(np.float32)], 0
            )
        )
        from rampvo_tpu.lie import ops as lops
        poses7 = lops.se3_exp(poses)
        poses7 = jnp.concatenate(
            [poses7, jnp.zeros((3, 7)).at[:, 6].set(1.0)], 0
        )
        pwin = jnp.asarray(rng.rand(Mwin, 3, 3, 3), jnp.float32)
        pwin = pwin.at[:, 2].set(0.5 + 0.2 * pwin[:, 2])
        cwin = pwin[:, :, 1, 1]  # ba_infer is centers-based
        intr = jnp.asarray([40.0, 40.0, 32.0, 24.0], jnp.float32)
        targets = jnp.asarray(rng.rand(E, 2) * 60, jnp.float32)
        weights = jnp.asarray(rng.rand(E, 2), jnp.float32)

        args = (poses7, cwin, intr, targets, weights, jnp.float32(1e-4),
                iif, jjf, kkf, jnp.int32(1), jnp.int32(n))
        p_a, q_a = ba_infer(*args, N=Nwin, M=Mwin, iterations=2, valid=vf)

        wf = base + jnp.arange(Mwin // Mp, dtype=jnp.int32)
        wrow = jnp.mod(wf, NI)
        held = host_of_row(wrow, jnp.int32(n), NI) == wf
        win_rows = jnp.where(held & (wf < n), wrow, -1).astype(jnp.int32)
        p_b, q_b = ba_infer(*args, N=Nwin, M=Mwin, iterations=2, valid=vf,
                            lattice=(NI, T, Mp), win_rows=win_rows)

        # the two paths reassociate float sums; the GN solve amplifies that
        # on this random (ill-conditioned) problem — end-to-end is a loose
        # check, the tight one is on the assembled normal equations below
        np.testing.assert_allclose(
            np.asarray(p_a), np.asarray(p_b), atol=0.05
        )
        np.testing.assert_allclose(
            np.asarray(q_a), np.asarray(q_b), atol=0.05
        )

        # tight: assembled normal equations match to f32 rounding
        from rampvo_tpu.ba.core import (
            _assemble,
            _assemble_cellwise,
            linearize_center,
        )

        centers = cwin[kkf]
        intr_e = jnp.broadcast_to(intr, (E, 4))
        coords, Z, Ji, Jj, Jz = linearize_center(
            poses7, centers, intr_e, intr_e, iif, jjf
        )
        rr = targets - coords
        cx, cy = 32.0, 24.0
        gate = (
            (jnp.linalg.norm(rr, axis=-1) < 128.0) & (Z > 0.2)
            & (coords[..., 0] > -64) & (coords[..., 1] > -64)
            & (coords[..., 0] < 2 * cx + 64)
            & (coords[..., 1] < 2 * cy + 64)
        ) & vf
        w = jnp.where(gate[:, None], weights, 0.0)
        rg = jnp.where(gate[:, None], rr, 0.0)
        t0 = 1
        A = _assemble(rg, w, Ji, Jj, Jz, iif - t0, jjf - t0, kkf,
                      Nwin, Mwin)
        B = _assemble_cellwise(rg, w, Ji, Jj, Jz, iif - t0, jjf - t0,
                               Nwin, Mwin, (NI, T, Mp), win_rows)
        for name, a, b in zip(["B", "E", "C", "v", "u", "tch"], A, B):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            scale = max(np.abs(a).max(), 1.0)
            assert np.abs(a - b).max() / scale < 1e-5, name

        # cell-wise linearization (per-cell relative pose + 6x6 adjoint
        # matmul) must match the per-edge path to f32 rounding
        from rampvo_tpu.ba.core import linearize_center_cells

        ii_c = iif.reshape(-1, Mp)[:, 0]
        jj_c = jjf.reshape(-1, Mp)[:, 0]
        coords2, Z2, Ji2, Jj2, Jz2 = linearize_center_cells(
            poses7, centers, intr, ii_c, jj_c, Mp
        )
        for name, a, b in zip(
            ["coords", "Z", "Ji", "Jj", "Jz"],
            (coords, Z, Ji, Jj, Jz),
            (coords2, Z2, Ji2, Jj2, Jz2),
        ):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            scale = max(np.abs(a).max(), 1.0)
            assert np.abs(a - b).max() / scale < 1e-5, (
                name, np.abs(a - b).max()
            )
