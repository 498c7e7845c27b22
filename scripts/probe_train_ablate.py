"""TRUE train-step stage costs by ablation (the training analogue of
probe_frame_ablate.py): time the full jitted train step with stages removed
via TrainForward(ablate=...) and diff against the full step.

Each variant is a separate full-res compile (slow); run alone on the chip:
PYTHONPATH=.:/root/.axon_site python scripts/probe_train_ablate.py
Optional args: --small (240x320, quicker iteration) --variants a,b,c
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rampvo_tpu.lie import ops as lops
from rampvo_tpu.models import VONet
from rampvo_tpu.parallel import make_train_step
from rampvo_tpu.train import TrainForward

VARIANTS = {
    "full": frozenset(),
    "no_corr": frozenset({"corr"}),
    "no_encoder": frozenset({"encoder"}),
    "no_ba": frozenset({"ba"}),
    "no_update": frozenset({"update"}),
    "pose_only": frozenset({"corr", "encoder", "update"}),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--variants", type=str, default=",".join(VARIANTS))
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    H, W = (240, 320) if args.small else (480, 640)
    NF, M, STEPS = 15, 96, 18
    vonet = VONet(input_mode="MultiScale")
    params0 = vonet.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, H, W, 5)), jnp.zeros((1, H, W, 3)),
        jnp.asarray([True]),
    )
    optimizer = optax.chain(
        optax.clip_by_global_norm(10.0),
        optax.adamw(1e-4, weight_decay=1e-6),
    )

    rng = np.random.RandomState(0)
    B = 1
    batch = {
        "events": jnp.asarray(rng.rand(B, NF, H, W, 5), jnp.float32),
        "images": jnp.asarray(rng.rand(B, NF, H, W, 3), jnp.float32),
        "poses": jnp.asarray(
            np.asarray(
                lops.se3_exp(
                    jnp.asarray(0.05 * rng.randn(B * NF, 6), jnp.float32)
                )
            ).reshape(B, NF, 7)
        ),
        "disps": jnp.asarray(0.5 + 0.1 * rng.rand(B, NF, H, W), jnp.float32),
        "intrinsics": jnp.broadcast_to(
            jnp.asarray([320.0, 320.0, W / 2, H / 2]), (B, NF, 4)
        ),
        "mask": jnp.ones((B, NF), bool),
    }

    results = {}
    for name in args.variants.split(","):
        fwd = TrainForward(vonet, n_frames=NF, M=M, steps=STEPS,
                           ablate=VARIANTS[name])
        step = make_train_step(fwd, optimizer)
        # params/opt_state are DONATED by the train step: each variant
        # needs fresh copies or the second variant hits deleted arrays
        params = jax.tree_util.tree_map(jnp.copy, params0)
        opt_state = optimizer.init(params)
        t0 = time.perf_counter()
        params, opt_state, loss, _ = step(
            params, opt_state, batch, jax.random.PRNGKey(1)
        )
        lv = float(loss)
        print(f"{name:11s} compile+first: {time.perf_counter()-t0:5.0f}s "
              f"loss={lv:.3f}", flush=True)
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            params, opt_state, loss, _ = step(
                params, opt_state, batch, jax.random.PRNGKey(2)
            )
            float(loss)
            best = min(best, time.perf_counter() - t0)
        results[name] = best
        print(f"{name:11s} {best:6.2f} s/step", flush=True)

    print("\nsummary (diffs vs full):")
    full = results.get("full")
    for name, s in results.items():
        d = f" ({s - full:+5.2f})" if full and name != "full" else ""
        print(f"  {name:11s} {s:6.2f} s{d}")


if __name__ == "__main__":
    main()
