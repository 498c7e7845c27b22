"""End-to-end CLI evaluation on the synthetic scene (SURVEY.md §4 item 3).

Uses a random-init network, so this checks the full pipeline wiring
(scene -> loader -> SLAM -> trajectory -> metrics -> result files), not
tracking accuracy."""

import json
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import synthetic
from rampvo_tpu.cli.evaluate import evaluate
from rampvo_tpu.models import VONet
from rampvo_tpu.vo import VOConfig

H, W = 60, 80


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("scenes") / "P000"
    synthetic.write_scene(str(root), n_frames=10, H=H, W=W)
    return str(root)


import pytest

pytestmark = pytest.mark.slow


def test_scene_crash_degrades_to_sentinel(scene, tmp_path, monkeypatch):
    """A crash inside one scene scores ate=1000 instead of aborting the
    run (ref: evaluate.py:308-310)."""
    import rampvo_tpu.cli.evaluate as ev

    def boom(*a, **kw):
        raise RuntimeError("simulated per-scene failure")

    monkeypatch.setattr(ev, "evaluate_sequence", boom)
    monkeypatch.setattr(ev, "load_params", lambda net, mode: net)

    eval_cfg = json.loads(json.dumps(synthetic.EVAL_CFG))
    eval_cfg["data_loader"]["test"] = {
        "test_split": [scene],
        "dataset_name": "Synthetic",
        "use_pose_pred": False,
    }
    results = ev.evaluate(
        net={}, trials=2, config_VO=VOConfig(), eval_cfg=eval_cfg,
        save_dir=str(tmp_path / "trajs"),
    )
    for j in range(2):
        assert results[scene][f"trial_{j}"]["ate"] == 1000.0
        assert results[scene][f"trial_{j}"]["rot_err"] == [1000.0] * 3


@pytest.mark.parametrize("input_mode", ["MultiScale", "SingleScale"])
def test_evaluate_cli_end_to_end(scene, tmp_path, input_mode):
    eval_cfg = json.loads(json.dumps(synthetic.EVAL_CFG))
    eval_cfg["data_loader"]["train"]["args"]["input_mode"] = input_mode
    eval_cfg["data_loader"]["test"] = {
        "test_split": [scene],
        "dataset_name": "Synthetic",
        "use_pose_pred": False,
    }

    cfg = VOConfig(
        BUFFER_SIZE=64, MAX_FRAMES=64, PATCHES_PER_FRAME=8,
        REMOVAL_WINDOW=5, OPTIMIZATION_WINDOW=4, PATCH_LIFETIME=3,
        KEYFRAME_INDEX=2, MIXED_PRECISION=False, PROBE_THRESH=-1.0, MEM=16,
    )

    vonet = VONet(input_mode=input_mode)
    params = vonet.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 480, 640, 5)),
        jnp.zeros((1, 480, 640, 3)),
        jnp.asarray([True]),
    )

    results_path = str(tmp_path / "results.json")
    results = evaluate(
        net=params, trials=1, config_VO=cfg, eval_cfg=eval_cfg,
        results_path=results_path,
        save_dir=str(tmp_path / "trajs"),
    )

    assert scene in results
    trial = results[scene]["trial_0"]
    assert np.isfinite(trial["ate"])
    assert len(trial["rot_err"]) == 3

    saved = json.load(open(results_path))
    assert "test_info" in saved
    # stamped trajectories written
    tdir = tmp_path / "trajs" / "full_data" / "trial_0" / "P000"
    est = np.loadtxt(tdir / "stamped_traj_estimate.txt")
    gt = np.loadtxt(tdir / "stamped_groundtruth.txt")
    assert est.shape[1] == 8 and gt.shape[1] == 8
    assert est.shape[0] >= 5


def test_evaluate_cli_mixed_precision_bf16_carry(scene, tmp_path):
    """MIXED_PRECISION eval end-to-end: the encoder state is created AND
    carried in bf16 (make_enc_state), and events-only frames run the
    same autocast treatment (r05 regression: encode_only previously ran
    the flax encoder in f32 against a bf16 carry -> scan carry dtype
    mismatch -> every scene degraded to the ate=1000 sentinel)."""
    eval_cfg = json.loads(json.dumps(synthetic.EVAL_CFG))
    eval_cfg["data_loader"]["test"] = {
        "test_split": [scene],
        "dataset_name": "Synthetic",
        "use_pose_pred": False,
    }
    cfg = VOConfig(
        BUFFER_SIZE=64, MAX_FRAMES=64, PATCHES_PER_FRAME=8,
        REMOVAL_WINDOW=5, OPTIMIZATION_WINDOW=4, PATCH_LIFETIME=3,
        KEYFRAME_INDEX=2, MIXED_PRECISION=True, PROBE_THRESH=-1.0, MEM=16,
    )
    vonet = VONet(input_mode="MultiScale")
    params = vonet.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 480, 640, 5)),
        jnp.zeros((1, 480, 640, 3)),
        jnp.asarray([True]),
    )
    results = evaluate(
        net=params, trials=1, config_VO=cfg, eval_cfg=eval_cfg,
        save_dir=str(tmp_path / "trajs_mp"),
    )
    trial = results[scene]["trial_0"]
    assert np.isfinite(trial["ate"])
    assert trial["ate"] != 1000.0, "sentinel: the MP path crashed"
