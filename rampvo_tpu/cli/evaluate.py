"""Evaluation CLI (ref: evaluate.py:313-440).

Flag-compatible with the reference:
  python -m rampvo_tpu.cli.evaluate --weights W --config_VO config_vo/x.yaml
      --config_eval config_net/x.json [--trials N] [--downsample_fact N]
      [--results_path out.json]

Consumes the same config_net/*.json + config_vo/*.yaml files, the same scene
directory layout, and emits the same outputs (per-trial ATE/rot JSON,
stamped TUM trajectories, COLMAP export).
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import traceback

import numpy as np

from ..data.loader import data_loader_all_events
from ..vo import RampVO, VOConfig
from . import eval_utils as eu


def load_intrinsics(K_path=None, resize_to=None):
    """(ref: evaluate.py:44-70)"""
    if K_path is None or not os.path.exists(K_path):
        print("Using default intrinsics", [320, 320, 320, 240])
        return (320.0, 320.0, 320.0, 240.0)
    import yaml

    with open(K_path) as f:
        data = yaml.safe_load(f)
    fx, fy, cx, cy = data["cam0"]["intrinsics"]
    if resize_to is not None:
        res = data["cam0"]["resolution"]
        slack = np.array(resize_to) - np.array(res)
        cx += slack[0] / 2
        cy += slack[1] / 2
    print(f"Using intrinsics from {K_path}", (fx, fy, cx, cy))
    return (fx, fy, cx, cy)


def load_params(weights, input_mode: str):
    """Accepts a .pth (imported), an orbax dir, or in-memory flax params."""
    if isinstance(weights, (dict,)) and "params" in weights:
        return weights
    if isinstance(weights, str) and weights.endswith(".pth"):
        from ..ckpt import import_pth

        variables, _ = import_pth(weights, input_mode)
        return variables
    if isinstance(weights, str):
        from ..ckpt import restore_checkpoint

        return restore_checkpoint(weights)["params"]
    raise ValueError(f"unsupported weights: {weights!r}")


def run(config_VO: VOConfig, params, eval_cfg, data_list,
        final_iters: int = 12, event_bias=None, seed: int = 0,
        chunk: int = 1):
    """Run the SLAM over a scene's data list (ref: evaluate.py:232-260).

    Returns (poses [N,7] xyz+xyzw camera-to-world, tstamps, points, colors).
    """
    train_cfg = eval_cfg["data_loader"]["train"]["args"]
    input_mode = train_cfg["input_mode"]
    bias = train_cfg.get("event_bias", True) if event_bias is None else event_bias

    d0 = data_list[0]
    H, W = d0["image"].shape[1:3]
    slam = RampVO(
        config_VO, params, input_mode=input_mode,
        num_event_bins=train_cfg["num_event_bins"], ht=H, wd=W,
        event_bias=bias, seed=seed, chunk=chunk,
    )
    from ..data.loader import device_prefetch

    for t, d in enumerate(device_prefetch(data_list)):
        slam(
            t,
            d["events"],  # [T=1, H, W, C], prefetched to device
            d["image"],   # [1, H, W, 3]
            d["mask"],
            d["intrinsics"],
        )

    slam.final_refinement(final_iters)
    poses, tstamps = slam.terminate()
    points, colors = slam.point_cloud()
    return poses, tstamps, points, colors


def evaluate_sequence(config_VO, params, eval_cfg, data_list, traj_ref,
                      img_timestamps, use_pose_pred=False, seed: int = 0,
                      chunk: int = 1):
    """(ref: evaluate.py:263-312)"""
    if use_pose_pred:
        # predict the second half of the trajectory (ref: evaluate.py:268-279)
        t_to_pred = traj_ref.num_poses // 2
        poses, tstamps = run_pose_pred(
            config_VO, params, eval_cfg, data_list,
            t_horizon_to_pred=traj_ref.num_poses - t_to_pred,
            t_to_pred=t_to_pred,
        )
        points = np.zeros((len(poses), 3), np.float32)
        colors = np.zeros((len(poses), 3), np.float32)
    else:
        poses, tstamps, points, colors = run(
            config_VO, params, eval_cfg, data_list, seed=seed, chunk=chunk
        )
    used = img_timestamps[: len(poses)] if len(img_timestamps) >= len(poses) \
        else np.arange(len(poses), dtype=float)
    traj_est = eu.est_trajectory(poses, used)
    ate, rot = eu.score(traj_ref, traj_est)
    return ate, rot, traj_est, traj_ref, (points, colors)


def evaluate(net, trials=1, downsample_fact=1, config_VO=None, eval_cfg=None,
             results_path=None, save_dir="trajectory_evaluation",
             colmap_dir=None, chunk=1):
    """Per-scene evaluation loop (ref: evaluate.py:313-412)."""
    test_ = eval_cfg["data_loader"]["test"]
    train_ = eval_cfg["data_loader"]["train"]["args"]
    norm_to = train_.get("norm_to")
    test_split = test_["test_split"]
    dataset_name = test_["dataset_name"]
    input_mode = train_["input_mode"]

    if config_VO is None:
        config_VO = VOConfig()
    params = load_params(net, input_mode)

    results = {}
    for scene in test_split:
        if not os.path.exists(scene):
            raise FileNotFoundError(f"scene {scene} not found")
        scene_name = os.path.basename(scene) if os.path.isdir(scene) else scene
        traj_ref_path = osp.join(scene, "pose_left.txt")
        timestamps_path = osp.join(scene, "timestamps.txt")
        img_timestamps = np.loadtxt(timestamps_path)

        if "Tartan" in dataset_name or "Synthetic" in dataset_name:
            intr = load_intrinsics(osp.join(scene, "K.yaml"))
            traj_ref = eu.read_tartan_format_poses(traj_ref_path, timestamps_path)
        elif "StereoDavis" in dataset_name:
            intr = load_intrinsics(osp.join(scene, "K.yaml"))
            img_timestamps = img_timestamps / 1e6
            traj_ref = eu.read_stereodavis_format_poses(
                osp.join(scene, "poses.txt"),
                osp.join(scene, "timestamps_poses.txt"),
            )
        elif "EDS" in dataset_name:
            intr = load_intrinsics(osp.join(scene, "K.yaml"))
            img_timestamps = img_timestamps / 1e6
            traj_ref = eu.read_eds_format_poses(traj_ref_path)
        elif "MoonLanding" in dataset_name:
            intr = load_intrinsics(osp.join(scene, "K.yaml"))
            traj_ref = eu.read_moonlanding_format_poses(
                traj_ref_path, timestamps_path
            )
        else:
            raise NotImplementedError(f"dataset {dataset_name} not supported")

        data_list, frame_indices = data_loader_all_events(
            config=eval_cfg, full_scene=scene,
            downsample_fact=downsample_fact, norm_to=norm_to, intrinsics=intr,
        )
        data_list, traj_ref = eu.select_scene_cut(data_list, traj_ref, scene)
        # frame_indices index the frame list the loader actually used
        # (imfiles[1::ds]); align timestamps the same way (the reference
        # indexes the full array, evaluate.py:384 — an off-by-one)
        used_ts = img_timestamps[1::downsample_fact]

        results[scene] = {}
        for j in range(trials):
            # per-trial degradation: a crash inside one scene (compile
            # failure, bad data) scores the ate=1000 sentinel instead of
            # aborting the whole multi-scene run (ref: evaluate.py:308-310)
            try:
                ate, rot, traj_est, ref, (points, colors) = evaluate_sequence(
                    config_VO, params, eval_cfg, data_list, traj_ref,
                    used_ts[frame_indices] if len(frame_indices) else used_ts,
                    use_pose_pred=test_.get("use_pose_pred", False),
                    seed=j,  # trials differ through the stochastic pieces
                    chunk=chunk,
                )
            except Exception as e:
                traceback.print_exc()
                print(f"\n {scene_name} trial {j} FAILED ({e}): ate=1000")
                results[scene][f"trial_{j}"] = {
                    "ate": 1000.0, "rot_err": [1000.0] * 3,
                }
                continue
            print(f"\n {scene_name} trial {j}: ate={ate:.4f} rot={rot}")
            eu.save_stamped_trajectories(
                osp.join(save_dir, "full_data", f"trial_{j}", scene_name),
                ref, traj_est,
            )
            if colmap_dir:
                fx, fy, cx, cy = intr
                eu.save_output_for_colmap(
                    colmap_dir, traj_est, points, colors, fx, fy, cx, cy,
                )
            results[scene][f"trial_{j}"] = {"ate": ate, "rot_err": list(rot)}

        if results_path is not None:
            with open(results_path, "w") as f:
                json.dump(results, f, indent=4)

    if results_path is not None:
        results["test_info"] = [
            {"config_VO": config_VO.__dict__}, train_, test_,
        ]
        with open(results_path, "w") as f:
            json.dump(results, f, indent=4)
    return results


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--weights", default="RAMPVO_MultiScale.pth")
    parser.add_argument("--config_VO", default="config_vo/default.yaml")
    parser.add_argument("--config_eval", type=str,
                        default="config_net/MultiScale_TartanEvent.json")
    parser.add_argument("--trials", type=int, default=1)
    parser.add_argument("--downsample_fact", type=int, default=1)
    parser.add_argument("--chunk", type=int, default=1,
                        help="frames per device dispatch (lax.scan chunking;"
                        " amortizes dispatch overhead at `chunk` frames of"
                        " latency)")
    parser.add_argument("--results_path", type=str, default=None)
    # fleet scale-out (parallel/eval_fleet.py): --fleet N spawns N worker
    # processes, each evaluating a round-robin scene shard (--shard i:N)
    parser.add_argument("--fleet", type=int, default=0,
                        help="spawn N scene-shard workers and merge results")
    parser.add_argument("--shard", type=str, default=None,
                        help="evaluate only shard i of n (format i:n)")
    parser.add_argument("--backend", type=str, default=None,
                        help="force a JAX backend (e.g. cpu) before init")
    args = parser.parse_args()

    if args.backend:
        import jax

        jax.config.update("jax_platforms", args.backend)

    if args.fleet:
        from ..parallel.eval_fleet import run_fleet

        argv = [
            "--weights", args.weights, "--config_VO", args.config_VO,
            "--config_eval", args.config_eval, "--trials", str(args.trials),
            "--downsample_fact", str(args.downsample_fact),
        ]
        if args.backend:
            argv += ["--backend", args.backend]
        results = run_fleet(args.fleet, argv, args.results_path)
        for k in results:
            print(k, results[k])
        return

    config_VO = VOConfig.from_yaml(args.config_VO)
    eval_cfg = json.load(open(args.config_eval))
    if args.shard:
        from ..parallel.eval_fleet import parse_shard

        test_ = eval_cfg["data_loader"]["test"]
        test_["test_split"] = parse_shard(args.shard, test_["test_split"])
        if not test_["test_split"]:
            return  # empty shard: no scenes, no results file

    print("Running evaluation...")
    results = evaluate(
        net=args.weights, trials=args.trials,
        downsample_fact=args.downsample_fact, config_VO=config_VO,
        eval_cfg=eval_cfg, results_path=args.results_path, chunk=args.chunk,
    )
    for k in results:
        print(k, results[k])


if __name__ == "__main__":
    main()


def run_pose_pred(config_VO, params, eval_cfg, data_list, t_horizon_to_pred,
                  t_to_pred, deg_approx=4):
    """Pose-prediction evaluation mode (ref: evaluate.py:184-229): run the
    SLAM up to t_to_pred, then extrapolate the remaining horizon with the
    spline predictor instead of ingesting frames."""
    import jax.numpy as jnp

    train_cfg = eval_cfg["data_loader"]["train"]["args"]
    d0 = data_list[0]
    H, W = d0["image"].shape[1:3]
    slam = RampVO(
        config_VO, params, input_mode=train_cfg["input_mode"],
        num_event_bins=train_cfg["num_event_bins"], ht=H, wd=W,
        event_bias=train_cfg.get("event_bias", True),
    )
    last_kf = 0
    for t, d in enumerate(data_list):
        if t < t_to_pred or t_to_pred < 0:
            slam(t, jnp.asarray(d["events"]), jnp.asarray(d["image"]),
                 d["mask"], d["intrinsics"])
            last_kf = int(slam.state.n)
        if t == t_to_pred and t_to_pred > 0:
            slam.final_refinement(12)
        if t >= t_to_pred and t_to_pred > 0:
            slam.predict_future_pose(
                sec_to_pred_future=t - t_to_pred, abs_time=t,
                last_keyframe_number=last_kf, deg=deg_approx,
            )
        if t == t_to_pred + t_horizon_to_pred:
            break

    slam.final_refinement(12)
    return slam.terminate()
