"""Training CLI (ref: train.py:67-232).

Flag-compatible:
  python -m rampvo_tpu.cli.train --config_path config_net/X.json
      --data_path D [--name N] [--ckpt C] [--log_results] [--workers W]

AdamW + linear OneCycle (optax), gradient clipping, orbax checkpoints every
steps_to_save_ckpt, periodic validation via cli.evaluate, optional wandb.
Data parallel over all local devices through parallel.make_train_step.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def make_optimizer(train_cfg):
    import optax

    schedule = optax.linear_onecycle_schedule(
        transition_steps=train_cfg["steps"],
        peak_value=train_cfg["lr"],
        pct_start=train_cfg.get("pct_start", 0.01),
        pct_final=1.0,
        div_factor=25.0,
        final_div_factor=1e4,
    )
    return optax.chain(
        optax.clip_by_global_norm(train_cfg["clip"]),
        optax.adamw(schedule, weight_decay=train_cfg["weight_decay"]),
    )


def collate(samples):
    return {
        k: np.stack([s[k] for s in samples]) for k in samples[0]
    }


def train(args):
    import jax
    import jax.numpy as jnp

    from ..ckpt import restore_checkpoint, save_checkpoint
    from ..data.tartan import TartanEventDataset
    from ..lie import ops as lops
    from ..models import VONet
    from ..parallel import make_mesh, make_train_step, shard_batch
    from ..train import TrainForward

    config = json.load(open(args.config_path))
    train_cfg = config["data_loader"]["train"]["args"]
    run_name = args.name or config.get("experiment_name", "rampvo_tpu")

    try:
        import wandb

        log_results = args.log_results
    except ImportError:
        wandb = None
        log_results = False
        if args.log_results:
            print("WARNING: wandb is not installed, cannot log results")

    H = train_cfg["image_height"]
    W = train_cfg["image_width"]
    NF = train_cfg["n_frames"]
    bins = train_cfg["num_event_bins"]

    vonet = VONet(input_mode=train_cfg["input_mode"], evs_ch=bins)
    params = vonet.init(
        jax.random.PRNGKey(args.seed),
        jnp.zeros((1, H, W, bins)), jnp.zeros((1, H, W, 3)),
        jnp.asarray([True]),
    )

    fwd = TrainForward(
        vonet, n_frames=NF, M=80, steps=args.unroll_steps,
        flow_weight=train_cfg["flow_weight"],
        pose_weight=train_cfg["pose_weight"],
        event_bias=train_cfg.get("event_bias", True),
        gradient_bias=train_cfg.get("gradient_bias", False),
    )
    optimizer = make_optimizer(train_cfg)
    opt_state = optimizer.init(params)

    step = 0
    if args.ckpt is not None:
        if args.ckpt.endswith(".pth"):
            from ..ckpt import import_pth

            params, _ = import_pth(args.ckpt, train_cfg["input_mode"])
        else:
            restored = restore_checkpoint(args.ckpt)
            params = restored["params"]
            opt_state = restored.get("opt_state", opt_state)
            step = int(restored.get("step", 0))

    mesh = make_mesh()
    n_dev = int(mesh.devices.size)
    batch_size = max(train_cfg.get("batch_size", 1), 1) * n_dev

    def structure_only():
        # ref train.py:156: structure-only (frozen poses) warmup steps
        so_steps = getattr(args, "structure_only_steps", 1000)
        return step < so_steps and args.ckpt is None

    step_fns = {}

    def get_step_fn(so):
        if so not in step_fns:
            step_fns[so] = make_train_step(
                fwd, optimizer, mesh=mesh, structure_only=so
            )
        return step_fns[so]

    dataset = TartanEventDataset(
        config, args.data_path, step=step, seed=args.seed,
        fmin=args.fmin, fmax=args.fmax,
    )
    if len(dataset) == 0:
        raise RuntimeError(f"no training scenes found under {args.data_path}")

    def make_batch():
        samples = [
            dataset[int(np.random.randint(1, max(len(dataset), 2)))]
            for _ in range(batch_size)
        ]
        return shard_batch(mesh, collate(samples))

    if args.workers > 0:
        # one-deep host pipeline: a single background thread prepares the
        # next batch while the device steps (h5py handles are not
        # thread-safe under concurrent reads, so exactly one loader thread;
        # the ref's DataLoader workers serve the same role, train.py:109-115)
        from concurrent.futures import ThreadPoolExecutor

        _pool = ThreadPoolExecutor(max_workers=1)
        _fut = [_pool.submit(make_batch)]

        def next_batch():
            b = _fut[0].result()
            _fut[0] = _pool.submit(make_batch)
            return b
    else:
        next_batch = make_batch

    # TB/stdout running-mean logger (ref keeps ramp/logger.py unwired;
    # here it complements the optional wandb stream)
    logger = None
    if args.tensorboard:
        from ..utils.logger import Logger

        logger = Logger(run_name, log_dir=args.tensorboard)

    rng = jax.random.PRNGKey(args.seed + 1)
    t_start = time.time()
    while step < train_cfg["steps"]:
        batch = next_batch()

        rng, k = jax.random.split(rng)
        train_step = get_step_fn(structure_only())
        params, opt_state, loss, metrics = train_step(
            params, opt_state, batch, k
        )
        step += 1

        if logger is not None:
            logger.push({k2: float(v) for k2, v in metrics.items()})

        if step % args.print_every == 0:
            m = {k2: float(v) for k2, v in metrics.items()}
            m["step"] = step
            m["sps"] = step / (time.time() - t_start)
            print(m, flush=True)
            if log_results and wandb is not None:
                wandb.log(m, step=step)

        if step % train_cfg["steps_to_save_ckpt"] == 0:
            ckpt_dir = os.path.join("checkpoints", run_name)
            save_checkpoint(ckpt_dir, step, params, opt_state)

            if args.validate:
                try:
                    from .evaluate import evaluate

                    results = evaluate(
                        net={"params": params["params"]}, eval_cfg=config,
                    )
                    print("validation:", results, flush=True)
                    if logger is not None:
                        flat = {
                            f"val/{os.path.basename(s)}": t["trial_0"]["ate"]
                            for s, t in results.items()
                            if isinstance(t, dict) and "trial_0" in t
                        }
                        logger.write_dict(flat)
                except Exception as e:  # ref behavior: log & continue
                    print(f"VALIDATION FAILED: {e}", flush=True)
    return params


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_path", type=str, help="Dataset path")
    parser.add_argument("--name", type=str, default=None)
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--config_path", type=str, required=True)
    parser.add_argument("--log_results", action="store_true", default=False)
    parser.add_argument("--tensorboard", type=str, default=None,
                        help="TensorBoard log dir (running means every 100 "
                        "steps; stdout fallback when TB is absent)")
    parser.add_argument("--workers", type=int, default=0)
    parser.add_argument("--fmin", type=float, default=10.0,
                        help="frame-graph min mean flow (px) for sampling")
    parser.add_argument("--fmax", type=float, default=75.0)
    parser.add_argument("--seed", type=int, default=1234)
    parser.add_argument("--unroll_steps", type=int, default=18)
    parser.add_argument("--structure_only_steps", type=int, default=1000,
                        help="structure-only warmup steps "
                             "(ref train.py:156; 0 = train poses from "
                             "step one)")
    parser.add_argument("--print_every", type=int, default=10)
    parser.add_argument("--validate", action="store_true", default=False)
    train(parser.parse_args())


if __name__ == "__main__":
    main()
