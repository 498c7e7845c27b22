"""Training dataset pipeline tests on the synthetic scene."""

import json

import numpy as np
import pytest

import synthetic
from rampvo_tpu.data.augmentation import (
    EventRGBDAugmentor,
    set_random_sample_to_zero,
    set_random_sequence_to_zero,
)
from rampvo_tpu.data.tartan import TartanEventDataset, normalize_depth_and_poses


def make_cfg(n_frames=6, nsel=400):
    return {
        "event_representation": "stack",
        "data_loader": {
            "train": {
                "args": {
                    "type": "train",
                    "input_mode": "MultiScale",
                    "event_bias": True,
                    "augment_data": False,
                    "load_sampled_frames": True,
                    "data_drop": "no",
                    "n_events_in_between": 1,
                    "num_events_selected": nsel,
                    "n_frames": n_frames,
                    "num_event_bins": 5,
                    "image_height": 60,
                    "image_width": 80,
                }
            },
            "test": {"test_split": []},
        },
    }


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_scene") / "P001"
    synthetic.write_scene(str(root), n_frames=14, H=60, W=80)
    return str(root)


class TestTartanDataset:
    def test_scan_and_sample_window(self, scene):
        cfg = make_cfg()
        ds = TartanEventDataset(cfg, scene, fmin=0.01, fmax=1000.0)
        assert len(ds) > 0
        item = ds[1]
        NF = 6
        T_cap = NF * 2
        assert item["events"].shape == (T_cap, 60, 80, 5)
        assert item["images"].shape == (NF, 60, 80, 3)
        assert item["poses"].shape == (NF, 7)
        assert item["disps"].shape == (NF, 60, 80)
        assert item["intrinsics"].shape == (NF, 4)
        assert item["mask"].shape == (T_cap,)
        assert item["mask"].sum() == NF
        for k in ("events", "images", "poses", "disps"):
            assert np.all(np.isfinite(item[k])), k

    def test_depth_pose_normalization(self):
        rng = np.random.RandomState(0)
        poses = rng.randn(5, 7).astype(np.float32)
        disps = (0.2 + rng.rand(5, 8, 8)).astype(np.float32)
        p2, d2 = normalize_depth_and_poses(poses, disps)
        s = 0.7 * np.quantile(disps, 0.98)
        np.testing.assert_allclose(d2, disps / s, rtol=1e-6)
        np.testing.assert_allclose(p2[:, :3], poses[:, :3] * s, rtol=1e-6)
        np.testing.assert_allclose(p2[:, 3:], poses[:, 3:])


class TestAugmentation:
    def test_shapes_and_intrinsics_consistency(self):
        rng = np.random.RandomState(0)
        T, N, H, W = 4, 4, 64, 96
        ev = rng.rand(T, H, W, 5).astype(np.float32)
        im = (rng.rand(N, H, W, 3) * 255).astype(np.float32)
        po = rng.randn(N, 7).astype(np.float32)
        di = (0.5 + rng.rand(N, H, W)).astype(np.float32)
        K = np.tile(np.array([50.0, 50.0, W / 2, H / 2], np.float32), (N, 1))

        aug = EventRGBDAugmentor(crop_size=(48, 64), seed=1)
        ev2, im2, po2, di2, K2 = aug(ev, im, po, di, K)
        assert im2.shape == (N, 48, 64, 3)
        assert di2.shape == (N, 48, 64)
        assert ev2.shape[0] == T and ev2.shape[1:3] == (48, 64)
        # focal scales with the spatial scale
        scale = K2[0, 0] / K[0, 0]
        assert scale >= 0.999  # crop 48x64 from 64x96 never downscales


class TestModalityDropout:
    def test_sequence_drop_modes(self):
        rng = np.random.RandomState(0)
        ev = np.ones((4, 8, 8, 5), np.float32)
        im = np.ones((4, 8, 8, 3), np.float32)
        seen = set()
        for seed in range(30):
            e2, i2 = set_random_sequence_to_zero(
                ev, im, np.random.RandomState(seed)
            )
            seen.add((bool(np.any(e2)), bool(np.any(i2))))
        # all three modes appear: drop events, drop images, drop none
        assert (False, True) in seen
        assert (True, False) in seen
        assert (True, True) in seen

    def test_sample_drop_keeps_pairs(self):
        rng = np.random.RandomState(3)
        ev = np.ones((10, 4, 4, 5), np.float32)
        im = np.ones((10, 4, 4, 3), np.float32)
        e2, i2 = set_random_sample_to_zero(ev, im, rng)
        ev_present = [bool(np.any(e2[i])) for i in range(10)]
        im_present = [bool(np.any(i2[i])) for i in range(10)]
        # no frame loses both modalities
        assert all(e or i for e, i in zip(ev_present, im_present))
        # something was dropped
        assert not all(ev_present) or not all(im_present)
