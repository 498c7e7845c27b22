"""End-to-end system validation: overfit on the synthetic scene, then show
the VO evaluation ATE improves over a random-init network.

Exercises the full loop: data pipeline -> scan-unrolled training forward ->
optax updates -> checkpoint -> VO runtime -> trajectory metrics.

Usage: python scripts/overfit_synthetic.py [--steps 200] [--cpu]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n_frames", type=int, default=8)
    ap.add_argument("--patches", type=int, default=16)
    ap.add_argument("--unroll", type=int, default=10)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    import synthetic
    from rampvo_tpu.cli.evaluate import evaluate
    from rampvo_tpu.data.tartan import TartanEventDataset
    from rampvo_tpu.lie import ops as lops
    from rampvo_tpu.models import VONet
    from rampvo_tpu.train import TrainForward
    from rampvo_tpu.vo import VOConfig

    H, W = 60, 80
    root = tempfile.mkdtemp() + "/scene"
    synthetic.write_scene(root, n_frames=40, H=H, W=W, motion="curve")

    cfg = json.loads(json.dumps(synthetic.EVAL_CFG))
    cfg["data_loader"]["train"]["args"]["n_frames"] = args.n_frames
    ds = TartanEventDataset(cfg, root, fmin=0.001, fmax=1000.0)
    print(f"dataset windows: {len(ds)}", flush=True)

    vonet = VONet(input_mode="MultiScale")
    params = vonet.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, H, W, 5)), jnp.zeros((1, H, W, 3)),
        jnp.asarray([True]),
    )
    params0 = params

    fwd = TrainForward(vonet, n_frames=args.n_frames, M=args.patches,
                       steps=args.unroll)
    opt = optax.chain(optax.clip_by_global_norm(0.1), optax.adamw(1e-4))
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, batch, rng):
        def loss_fn(p):
            return fwd(p, batch["events"], batch["images"], batch["poses"],
                       batch["disps"], batch["intrinsics"], batch["mask"],
                       rng)

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, metrics

    rng = jax.random.PRNGKey(1)
    t0 = time.time()
    for step in range(args.steps):
        item = ds[1 + step % max(len(ds) - 1, 1)]
        # world-to-camera poses like train.py:154 (SE3(poses).inv())
        w2c = np.asarray(lops.se3_inv(jnp.asarray(item["poses"])))
        batch = {
            "events": jnp.asarray(item["events"]),
            "images": jnp.asarray(item["images"]),
            "poses": jnp.asarray(w2c),
            "disps": jnp.asarray(item["disps"]),
            "intrinsics": jnp.asarray(item["intrinsics"]),
            "mask": jnp.asarray(item["mask"]),
        }
        rng, k = jax.random.split(rng)
        params, opt_state, loss, metrics = train_step(params, opt_state, batch, k)
        if step % 20 == 0 or step == args.steps - 1:
            print(f"step {step}: loss={float(loss):.4f} "
                  f"flow={float(metrics['flow_e']):.3f} "
                  f"px1={float(metrics['px1']):.3f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    # ---- evaluate both param sets through the full CLI path ----
    eval_cfg = json.loads(json.dumps(synthetic.EVAL_CFG))
    eval_cfg["data_loader"]["test"] = {
        "test_split": [root], "dataset_name": "Synthetic",
        "use_pose_pred": False,
    }
    vocfg = VOConfig(
        BUFFER_SIZE=64, MAX_FRAMES=64, PATCHES_PER_FRAME=args.patches,
        REMOVAL_WINDOW=8, OPTIMIZATION_WINDOW=6, PATCH_LIFETIME=5,
        KEYFRAME_INDEX=2, MIXED_PRECISION=False, PROBE_THRESH=-1.0, MEM=16,
    )

    def ate_of(p, tag):
        res = evaluate(net=p, trials=1, config_VO=vocfg, eval_cfg=eval_cfg,
                       save_dir=tempfile.mkdtemp())
        ate = res[root]["trial_0"]["ate"]
        print(f"{tag}: ATE = {ate:.4f}", flush=True)
        return ate

    ate_random = ate_of(params0, "random-init net")
    ate_trained = ate_of(params, "overfit net    ")
    print(f"improvement: {ate_random / max(ate_trained, 1e-9):.2f}x", flush=True)


if __name__ == "__main__":
    main()
