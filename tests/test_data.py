"""Data pipeline + metrics tests."""

import numpy as np
import pytest

from rampvo_tpu.data import Events, EventToStack, EventsToVoxelGrid, H5EventHandle
from rampvo_tpu.data.loader import data_loader_all_events, normalize_image, pad_or_resize
from rampvo_tpu.utils import ate_rmse, rot_error_per_axis, umeyama_alignment

import synthetic


class TestEvents:
    def test_polarity_remap_and_slice(self):
        ev = Events(
            x=np.array([1, 2, 3]), y=np.array([4, 5, 6]),
            t=np.array([10, 20, 30]), p=np.array([0, 1, 0]),
            width=10, height=10,
        )
        np.testing.assert_array_equal(ev.p, [-1, 1, -1])
        sub = ev[1:]
        assert len(sub) == 2 and sub.x[0] == 2


class TestRepresentations:
    def test_stack_count_binning(self):
        # 6 events, 3 bins -> 2 events per bin by arrival order
        ev = Events(
            x=np.array([0, 1, 2, 3, 4, 5]), y=np.zeros(6, int),
            t=np.arange(6) * 100, p=np.array([1, 1, 0, 0, 1, 1]),
            width=8, height=2,
        )
        s = EventToStack(3)(ev)
        assert s.shape == (3, 2, 8)
        assert s.dtype == np.int8
        assert s[0, 0, 0] == 1 and s[0, 0, 1] == 1
        assert s[1, 0, 2] == -1 and s[1, 0, 3] == -1
        assert s[2, 0, 4] == 1 and s[2, 0, 5] == 1

    def test_voxel_grid_bilinear_time(self):
        # one event at t midway between bins 0 and 1 splits its vote
        ev = Events(
            x=np.array([2, 3, 4]), y=np.array([0, 0, 0]),
            t=np.array([0, 50, 100]), p=np.array([1, 1, 1]),
            width=8, height=1,
        )
        v = EventsToVoxelGrid(3, normalize=False)(ev)
        assert v.shape == (3, 1, 8)
        np.testing.assert_allclose(v[0, 0, 2], 1.0)  # t=0 -> bin 0
        np.testing.assert_allclose(v[1, 0, 3], 1.0)  # t=50 -> bin 1 exactly
        np.testing.assert_allclose(v[2, 0, 4], 1.0)  # t=100 -> bin 2

    def test_voxel_normalization(self):
        rng = np.random.RandomState(0)
        ev = Events(
            x=rng.randint(0, 16, 100), y=rng.randint(0, 8, 100),
            t=np.sort(rng.randint(0, 1000, 100)), p=rng.randint(0, 2, 100),
            width=16, height=8,
        )
        v = EventsToVoxelGrid(5, normalize=True)(ev)
        nz = v[v != 0]
        assert abs(nz.mean()) < 1e-5
        assert abs(nz.std() - 1.0) < 1e-2


class TestMetrics:
    def test_umeyama_recovers_similarity(self):
        rng = np.random.RandomState(0)
        x = rng.randn(50, 3)
        from scipy.spatial.transform import Rotation as R

        Rm = R.from_euler("xyz", [0.3, -0.2, 0.5]).as_matrix()
        s, t = 1.7, np.array([1.0, -2.0, 0.5])
        y = (s * (Rm @ x.T)).T + t
        R2, t2, s2 = umeyama_alignment(x, y, with_scale=True)
        np.testing.assert_allclose(R2, Rm, atol=1e-8)
        np.testing.assert_allclose(t2, t, atol=1e-8)
        assert abs(s2 - s) < 1e-8

    def test_ate_zero_for_similar(self):
        rng = np.random.RandomState(1)
        x = rng.randn(30, 3)
        y = (2.0 * x) + np.array([5, 5, 5])
        assert ate_rmse(x, y) < 1e-8

    def test_ate_positive_for_noise(self):
        rng = np.random.RandomState(2)
        x = rng.randn(30, 3)
        y = x + 0.1 * rng.randn(30, 3)
        assert ate_rmse(x, y) > 0.01

    def test_rot_error_zero_for_identical(self):
        rng = np.random.RandomState(3)
        q = rng.randn(20, 4)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        err = rot_error_per_axis(q, q)
        assert np.all(err < 1e-6)

    # ---- evo-definition cross-checks (the headline ATE number rests on
    # these semantics: Umeyama least-squares similarity alignment of the
    # translation parts, then pointwise-distance RMSE — evaluate.py:294-304)

    def test_alignment_is_least_squares_optimal(self):
        """ate_rmse must equal the global minimum over ALL similarity
        transforms — cross-checked against a brute-force numeric optimizer
        (independent of the closed-form Umeyama implementation)."""
        from scipy.optimize import minimize
        from scipy.spatial.transform import Rotation as R

        rng = np.random.RandomState(7)
        x = np.cumsum(0.3 * rng.randn(20, 3), axis=0)  # noisy trajectory
        Rm = R.from_euler("xyz", [0.4, -0.7, 1.1]).as_matrix()
        y = (1.6 * (Rm @ x.T)).T + np.array([2.0, -1.0, 0.5])
        y += 0.05 * rng.randn(*y.shape)  # alignment can't be exact

        ours = ate_rmse(x, y, align=True, correct_scale=True)

        def cost(p):
            rot = R.from_rotvec(p[:3]).as_matrix()
            s = np.exp(p[3])
            t = p[4:]
            e = (s * (rot @ x.T)).T + t - y
            return np.sqrt((np.linalg.norm(e, axis=1) ** 2).mean())

        best = np.inf
        for seed in range(5):
            r2 = np.random.RandomState(seed)
            res = minimize(cost, np.r_[0.1 * r2.randn(3), 0.0, r2.randn(3)],
                           method="Nelder-Mead",
                           options={"maxiter": 20000, "xatol": 1e-10,
                                    "fatol": 1e-12})
            best = min(best, res.fun)
        assert ours <= best + 1e-6, (ours, best)
        assert abs(ours - best) < 1e-4, (ours, best)

    def test_alignment_beats_any_sampled_transform(self):
        from scipy.spatial.transform import Rotation as R

        rng = np.random.RandomState(8)
        x = np.cumsum(rng.randn(30, 3), axis=0)
        y = x + 0.2 * rng.randn(30, 3)
        ours = ate_rmse(x, y)
        for i in range(50):
            rot = R.from_rotvec(0.3 * rng.randn(3)).as_matrix()
            s = np.exp(0.2 * rng.randn())
            t = 0.5 * rng.randn(3)
            xt = (s * (rot @ x.T)).T + t
            rmse = np.sqrt((np.linalg.norm(xt - y, axis=1) ** 2).mean())
            assert ours <= rmse + 1e-9

    def test_no_reflection(self):
        """evo's Umeyama constrains det(R) = +1; a mirrored trajectory must
        NOT align to zero error via a reflection."""
        rng = np.random.RandomState(9)
        x = np.cumsum(rng.randn(25, 3), axis=0)
        y = x * np.array([1.0, 1.0, -1.0])  # mirror in z
        R2, t2, s2 = umeyama_alignment(x, y, with_scale=True)
        assert np.linalg.det(R2) > 0.99
        assert ate_rmse(x, y) > 0.05

    def test_scale_correction_flag(self):
        rng = np.random.RandomState(10)
        x = np.cumsum(rng.randn(25, 3), axis=0)
        y = 2.0 * x
        assert ate_rmse(x, y, correct_scale=True) < 1e-8
        assert ate_rmse(x, y, correct_scale=False) > 0.1

    def test_known_umeyama_answer_hand_case(self):
        """Hand-checkable fixture: planar square with one point lifted.
        Optimal similarity for y = 2 * x must recover s=2 exactly even with
        the configuration non-degenerate in all three axes."""
        x = np.array([
            [1.0, 0.0, 0.0], [-1.0, 0.0, 0.0],
            [0.0, 1.0, 0.0], [0.0, -1.0, 0.25],
        ])
        y = 2.0 * x + np.array([0.0, 0.0, 3.0])
        R2, t2, s2 = umeyama_alignment(x, y, with_scale=True)
        np.testing.assert_allclose(R2, np.eye(3), atol=1e-10)
        assert abs(s2 - 2.0) < 1e-10
        np.testing.assert_allclose(t2, [0.0, 0.0, 3.0], atol=1e-10)


class TestLoader:
    def test_normalize_image_default(self):
        img = np.full((2, 2, 3), 255.0)
        out = normalize_image(img)
        np.testing.assert_allclose(out, 1.5)
        np.testing.assert_allclose(normalize_image(np.zeros((2, 2, 3))), -0.5)

    def test_pad_or_resize_pads_centered(self):
        x = np.ones((1, 10, 20, 3))
        out = pad_or_resize(x, 16, 24)
        assert out.shape == (1, 16, 24, 3)
        assert out[0, 3, 2, 0] == 1.0  # interior
        assert out[0, 0, 0, 0] == 0.0  # padding

    def test_synthetic_scene_loader(self, tmp_path):
        root, intr = synthetic.write_scene(str(tmp_path / "scene"), n_frames=8)
        data_list, frame_indices = data_loader_all_events(
            synthetic.EVAL_CFG, root, intrinsics=intr
        )
        assert len(data_list) >= 4
        d0 = data_list[0]
        assert d0["events"].shape == (1, 480, 640, 5)  # padded to default res
        assert d0["image"].shape == (1, 480, 640, 3)
        # at least one supervised (frame-aligned) voxel
        assert any(bool(d["mask"][0]) for d in data_list)
        # events h5 round trip
        h = H5EventHandle.from_path(tmp_path / "scene" / "events.h5")
        assert len(h) > 0
        ev = h.get_between_idx(0, 10)
        assert len(ev) == 10
