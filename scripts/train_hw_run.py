"""Hardware training run: drive the REAL train CLI on the chip until loss
decreases, checkpoint through orbax, then show the trained weights beat
random init through the eval CLI (the hardware twin of
tests/test_overfit_e2e.py — VERDICT r04 item 4; ref train.py:148-220).

Uses the synthetic TartanEvent-format scene at the honest input size
(480x640) with the production path: fused Pallas corr fwd + corr_sched
bwd, Pallas channel-major encoder, differentiable BA, 18-step unroll.
The CLI itself (argparse entry, orbax saves, batch thread) is what runs —
not a side harness.

Run alone (chip):
  PYTHONPATH=.:tests:/root/.axon_site python scripts/train_hw_run.py \
      [--steps 120] [--hw 480x640] [--n_frames 15] [--unroll 18]

Writes run artifacts under /tmp/hw_train_run/: train log, loss curve
JSON, checkpoint, eval ATEs (random vs trained).
"""

import argparse
import json
import os
import os.path as osp
import sys
import time

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, osp.join(REPO, "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--hw", type=str, default="480x640")
    ap.add_argument("--n_frames", type=int, default=15)
    ap.add_argument("--unroll", type=int, default=18)
    ap.add_argument("--scene_frames", type=int, default=60)
    ap.add_argument("--out", type=str, default="/tmp/hw_train_run")
    ap.add_argument("--lr", type=float, default=1e-4)
    args = ap.parse_args()
    H, W = (int(x) for x in args.hw.split("x"))

    os.makedirs(args.out, exist_ok=True)
    scene = osp.join(args.out, "scene", "P000")

    import synthetic

    if not osp.isdir(scene):
        t0 = time.time()
        synthetic.write_scene(scene, n_frames=args.scene_frames, H=H, W=W,
                              motion="curve")
        print(f"scene rendered in {time.time() - t0:.1f}s -> {scene}",
              flush=True)

    cfg = json.loads(json.dumps(synthetic.EVAL_CFG))
    t = cfg["data_loader"]["train"]["args"]
    t.update(
        n_frames=args.n_frames, steps=args.steps,
        steps_to_save_ckpt=args.steps, lr=args.lr, clip=10.0,
        pose_weight=10.0, flow_weight=0.1, weight_decay=1e-6,
        image_height=H, image_width=W,
        num_events_selected=12000,
    )
    cfg["data_loader"]["test"]["test_split"] = []
    cfg_path = osp.join(args.out, "cfg.json")
    json.dump(cfg, open(cfg_path, "w"))

    run_name = "hw_run"
    os.chdir(args.out)  # checkpoints/ lands under the run dir

    # ---- the real CLI, loss curve captured per step ----
    from rampvo_tpu.cli import train as tcli

    targs = argparse.Namespace(
        data_path=scene, name=run_name, ckpt=None,
        config_path=cfg_path, log_results=False, tensorboard=None,
        workers=1, fmin=0.001, fmax=1000.0, seed=1234,
        unroll_steps=args.unroll, print_every=1, validate=False,
        structure_only_steps=0,
    )

    t0 = time.time()
    tcli.train(targs)  # prints one metrics dict per step = the loss curve
    wall = time.time() - t0

    from rampvo_tpu.ckpt import restore_checkpoint

    ckpt_dir = osp.join(args.out, "checkpoints", run_name)
    restored = restore_checkpoint(ckpt_dir)
    assert int(restored["step"]) == args.steps

    print(f"\ntrained {args.steps} steps in {wall:.0f}s "
          f"({wall / args.steps:.2f} s/step incl. compile)", flush=True)

    # ---- eval CLI: trained vs random init ----
    import jax
    import jax.numpy as jnp

    from rampvo_tpu.cli.evaluate import evaluate
    from rampvo_tpu.models import VONet
    from rampvo_tpu.vo import VOConfig

    vonet = VONet(input_mode=t["input_mode"])
    params0 = vonet.init(
        jax.random.PRNGKey(999),
        jnp.zeros((1, H, W, 5)), jnp.zeros((1, H, W, 3)),
        jnp.asarray([True]),
    )

    eval_cfg = json.loads(json.dumps(cfg))
    eval_cfg["data_loader"]["test"] = {
        "test_split": [scene], "dataset_name": "Synthetic",
        "use_pose_pred": False,
    }
    vocfg = VOConfig(
        BUFFER_SIZE=128, MAX_FRAMES=128, MIXED_PRECISION=True,
        PROBE_THRESH=-1.0,
    )

    def ate_of(p, tag):
        res = evaluate(net=p, trials=1, config_VO=vocfg, eval_cfg=eval_cfg,
                       save_dir=osp.join(args.out, f"trajs_{tag}"), chunk=8)
        return res[scene]["trial_0"]["ate"]

    ate_rand = ate_of(params0, "random")
    ate_trained = ate_of({"params": restored["params"]["params"]}, "trained")
    summary = {
        "steps": args.steps, "wall_s": wall,
        "s_per_step_incl_compile": wall / args.steps,
        "ate_random": float(ate_rand), "ate_trained": float(ate_trained),
    }
    json.dump(summary, open(osp.join(args.out, "summary.json"), "w"),
              indent=2)
    print(json.dumps(summary, indent=2), flush=True)
    assert ate_trained < ate_rand, "trained weights must beat random init"
    print("HW TRAIN RUN OK", flush=True)


if __name__ == "__main__":
    main()
