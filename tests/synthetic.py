"""Synthetic scene builders for tests and CLI smoke runs.

Creates a miniature TartanEvent-format scene on disk: a textured plane
observed by a translating pinhole camera, with synthetic events from frame
intensity differences — enough to drive the full data->VO->metrics path
CPU-only (SURVEY.md §4 test strategy)."""

from __future__ import annotations

import os
import os.path as osp

import numpy as np


def render_sequence(n_frames=10, H=60, W=80, fx=60.0, seed=0,
                    motion="line"):
    """Textured fronto-parallel plane, translating camera.

    motion "line": constant velocity in x (a damped-linear motion model
    free-rides on it); "curve": sinusoidal x/y so only real tracking keeps
    the trajectory. Returns images [n, H, W] in [0, 255], poses [n, 7]
    (camera-to-world, xyzw quat), intrinsics [4]."""
    rng = np.random.RandomState(seed)
    tex_h, tex_w = H * 3, W * 3
    tex = rng.rand(tex_h, tex_w) * 255.0
    # smooth the texture a little so gradients are informative
    k = np.ones((3, 3)) / 9.0
    from scipy.signal import convolve2d

    tex = convolve2d(tex, k, mode="same", boundary="wrap")

    Z = 2.0  # plane depth
    images, poses = [], []
    for i in range(n_frames):
        if motion == "curve":
            cam_x = 0.02 * i + 0.06 * np.sin(2 * np.pi * i / 12.0)
            cam_y = 0.06 * (1 - np.cos(2 * np.pi * i / 9.0))
        else:
            cam_x, cam_y = 0.02 * i, 0.0
        # camera at (cam_x, cam_y, 0) looking down +z: pixel (u, v) sees
        # texture at (u + fx*cam_x/Z, v + fx*cam_y/Z)
        su = fx * cam_x / Z
        sv = fx * cam_y / Z
        u = (np.arange(W) + su) % tex_w
        v = (np.arange(H) + sv) % tex_h
        u0 = np.floor(u).astype(int)
        v0 = np.floor(v).astype(int)
        a = (u - u0)[None, :]
        b = (v - v0)[:, None]
        t00 = tex[np.ix_(v0 % tex_h, u0 % tex_w)]
        t01 = tex[np.ix_(v0 % tex_h, (u0 + 1) % tex_w)]
        t10 = tex[np.ix_((v0 + 1) % tex_h, u0 % tex_w)]
        t11 = tex[np.ix_((v0 + 1) % tex_h, (u0 + 1) % tex_w)]
        img = (1 - b) * ((1 - a) * t00 + a * t01) + b * ((1 - a) * t10 + a * t11)
        images.append(img)
        poses.append([cam_x, cam_y, 0, 0, 0, 0, 1])
    intr = np.array([fx, fx, W / 2.0, H / 2.0], np.float32)
    return np.stack(images), np.asarray(poses, np.float64), intr


def events_from_images(images, thresh=6.0, t_per_frame=1000):
    """Per-pixel intensity-difference events between consecutive frames."""
    xs, ys, ts, ps = [], [], [], []
    for i in range(1, len(images)):
        d = images[i] - images[i - 1]
        y, x = np.nonzero(np.abs(d) > thresh)
        p = (d[y, x] > 0).astype(np.int8)
        t = np.full(len(x), i * t_per_frame, np.int64)
        # spread event times inside the frame interval
        t += np.linspace(0, t_per_frame - 1, len(x), dtype=np.int64) - t_per_frame
        xs.append(x)
        ys.append(y)
        ts.append(t)
        ps.append(p)
    x = np.concatenate(xs).astype(np.uint16)
    y = np.concatenate(ys).astype(np.uint16)
    t = np.concatenate(ts).astype(np.int64)
    p = np.concatenate(ps).astype(np.int8)
    order = np.argsort(t, kind="stable")
    return x[order], y[order], t[order], p[order]


def write_scene(root: str, n_frames=10, H=60, W=80, seed=0, motion="line"):
    """Write a TartanEvent-format scene directory; returns (root, intr)."""
    import h5py
    from PIL import Image

    images, poses, intr = render_sequence(n_frames, H, W, seed=seed,
                                          motion=motion)
    x, y, t, p = events_from_images(images)

    os.makedirs(osp.join(root, "image_left"), exist_ok=True)
    for i, img in enumerate(images):
        arr = np.clip(img, 0, 255).astype(np.uint8)
        Image.fromarray(np.stack([arr] * 3, -1)).save(
            osp.join(root, "image_left", f"{i:06d}.png")
        )

    with h5py.File(osp.join(root, "events.h5"), "w") as f:
        g = f.create_group("events")
        g.create_dataset("x", data=x)
        g.create_dataset("y", data=y)
        g.create_dataset("t", data=t)
        g.create_dataset("p", data=p)
        g.create_dataset("height", data=H)
        g.create_dataset("width", data=W)

    # frame i timestamp = i * 1000 (matches events_from_images)
    np.savetxt(osp.join(root, "timestamps.txt"), np.arange(n_frames) * 1000.0)

    # pose_left.txt in TartanAir NED layout: the reader permutes with
    # NED_TO_XYZ_PERM = [1,2,0,4,5,3,6] and drops the first row
    # (utils/eval_utils.py:139-148) — store the inverse permutation + a
    # dummy first row so reading recovers `poses`.
    inv_perm = [2, 0, 1, 5, 3, 4, 6]
    ned = poses[:, inv_perm]
    ned = np.concatenate([ned[:1], ned], axis=0)
    np.savetxt(osp.join(root, "pose_left.txt"), ned, delimiter=" ")

    fx, fy, cx, cy = [float(v) for v in intr]
    with open(osp.join(root, "K.yaml"), "w") as f:
        f.write(
            "cam0:\n"
            f"  intrinsics: [{fx}, {fy}, {cx}, {cy}]\n"
            f"  resolution: [{W}, {H}]\n"
        )

    # depths (constant plane at Z=2; stored pre-DEPTH_SCALE like TartanAir)
    os.makedirs(osp.join(root, "depth_left"), exist_ok=True)
    for i in range(n_frames):
        np.save(
            osp.join(root, "depth_left", f"{i:06d}_left_depth.npy"),
            np.full((H, W), 2.0 * 5.0, np.float32),
        )

    # per-frame event index ranges
    from rampvo_tpu.data.tartan import precompute_event_indices

    precompute_event_indices(
        osp.join(root, "events.h5"), osp.join(root, "timestamps.txt"),
        num_events=600, indices_file=osp.join(root, "indices.txt"),
    )
    return root, intr


EVAL_CFG = {
    "event_representation": "stack",
    "data_loader": {
        "train": {
            "args": {
                "type": "test",
                "input_mode": "MultiScale",
                "event_bias": True,
                "num_events_selected": 600,
                "n_frames": 15,
                "num_event_bins": 5,
                "image_height": 60,
                "image_width": 80,
            }
        },
        "test": {"test_split": []},
    },
}
