"""Scene-sharded evaluation fleet (parallel/eval_fleet.py): real worker
processes, round-robin shards, merged results — the TPU-native scale-out of
the reference's sequential scene loop (evaluate.py:313-412)."""

import json
import subprocess
import sys

import jax
import jax.numpy as jnp
import pytest
import yaml

import synthetic
from rampvo_tpu.ckpt import save_checkpoint
from rampvo_tpu.models import VONet
from rampvo_tpu.parallel import parse_shard, run_fleet, shard_scenes

H, W = 60, 80


def test_shard_assignment():
    scenes = [f"s{i}" for i in range(5)]
    shards = shard_scenes(scenes, 2)
    assert shards == [["s0", "s2", "s4"], ["s1", "s3"]]
    assert parse_shard("1:2", scenes) == ["s1", "s3"]
    # more workers than scenes -> empty shards allowed
    assert shard_scenes(["a"], 3) == [["a"], [], []]
    with pytest.raises(ValueError):
        parse_shard("2:2", scenes)


@pytest.mark.slow
def test_fleet_end_to_end(tmp_path):
    """Two CPU workers over two synthetic scenes; merged result JSON must
    contain both scenes' trials."""
    scenes = []
    for name in ("P000", "P001"):
        root = tmp_path / "scenes" / name
        synthetic.write_scene(str(root), n_frames=10, H=H, W=W)
        scenes.append(str(root))

    vonet = VONet(input_mode="MultiScale")
    params = vonet.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, H, W, 5)), jnp.zeros((1, H, W, 3)),
        jnp.asarray([True]),
    )
    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(ckpt_dir, 0, params)

    eval_cfg = json.loads(json.dumps(synthetic.EVAL_CFG))
    eval_cfg["data_loader"]["test"] = {
        "test_split": scenes, "dataset_name": "Synthetic",
        "use_pose_pred": False,
    }
    cfg_eval_path = tmp_path / "eval.json"
    cfg_eval_path.write_text(json.dumps(eval_cfg))

    vo_yaml = tmp_path / "vo.yaml"
    vo_yaml.write_text(yaml.safe_dump(dict(
        BUFFER_SIZE=64, MAX_FRAMES=64, PATCHES_PER_FRAME=8,
        REMOVAL_WINDOW=5, OPTIMIZATION_WINDOW=4, PATCH_LIFETIME=3,
        KEYFRAME_INDEX=2, MIXED_PRECISION=False, PROBE_THRESH=-1.0, MEM=16,
    )))

    results_path = str(tmp_path / "merged.json")
    argv = [
        "--weights", ckpt_dir + "/step_00000000",
        "--config_VO", str(vo_yaml),
        "--config_eval", str(cfg_eval_path),
        "--trials", "1",
        "--backend", "cpu",
    ]
    results = run_fleet(2, argv, results_path)

    for scene in scenes:
        assert scene in results, results.keys()
        assert "ate" in results[scene]["trial_0"]
    merged = json.load(open(results_path))
    assert set(scenes) <= set(merged)


@pytest.mark.slow
def test_fleet_cli_flag(tmp_path):
    """`--fleet 2` on the CLI drives the whole thing (spawn + merge)."""
    root = tmp_path / "scenes" / "P000"
    synthetic.write_scene(str(root), n_frames=10, H=H, W=W)

    vonet = VONet(input_mode="MultiScale")
    params = vonet.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, H, W, 5)), jnp.zeros((1, H, W, 3)),
        jnp.asarray([True]),
    )
    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(ckpt_dir, 0, params)

    eval_cfg = json.loads(json.dumps(synthetic.EVAL_CFG))
    eval_cfg["data_loader"]["test"] = {
        "test_split": [str(root)], "dataset_name": "Synthetic",
        "use_pose_pred": False,
    }
    cfg_eval_path = tmp_path / "eval.json"
    cfg_eval_path.write_text(json.dumps(eval_cfg))
    vo_yaml = tmp_path / "vo.yaml"
    vo_yaml.write_text(yaml.safe_dump(dict(
        BUFFER_SIZE=64, MAX_FRAMES=64, PATCHES_PER_FRAME=8,
        REMOVAL_WINDOW=5, OPTIMIZATION_WINDOW=4, PATCH_LIFETIME=3,
        KEYFRAME_INDEX=2, MIXED_PRECISION=False, PROBE_THRESH=-1.0, MEM=16,
    )))

    results_path = str(tmp_path / "merged.json")
    proc = subprocess.run(
        [sys.executable, "-m", "rampvo_tpu.cli.evaluate",
         "--weights", ckpt_dir + "/step_00000000",
         "--config_VO", str(vo_yaml),
         "--config_eval", str(cfg_eval_path),
         "--results_path", results_path,
         "--fleet", "2", "--backend", "cpu"],
        capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    merged = json.load(open(results_path))
    assert str(root) in merged
