"""Time one full-resolution training step on TPU (the reference recipe:
480x640, 15 frames, 18-step unroll, MultiScale, differentiable BA).
Round-1 baseline: 12.0 s/step."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rampvo_tpu.lie import ops as lops
from rampvo_tpu.models import VONet
from rampvo_tpu.parallel import make_train_step
from rampvo_tpu.train import TrainForward


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--impls", type=str, default="fused,xla",
                    help="comma list of corr impls to time in ONE process; "
                         "suffix _nosave disables the corr_out remat save")
    args = ap.parse_args()

    H, W, NF, M, STEPS = 480, 640, 15, 96, 18
    vonet = VONet(input_mode="MultiScale")
    params = vonet.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, H, W, 5)),
        jnp.zeros((1, H, W, 3)),
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

    for impl in args.impls.split(","):
        sc = not impl.endswith("_nosave")
        impl = impl.removesuffix("_nosave")
        fwd = TrainForward(vonet, n_frames=NF, M=M, steps=STEPS,
                           corr_impl=impl, save_corr=sc)
        step = make_train_step(fwd, optimizer)
        # params/opt_state are donated by the step: fresh copies per impl
        p = jax.tree_util.tree_map(jnp.copy, params)
        opt_state = optimizer.init(p)
        t0 = time.perf_counter()
        p, opt_state, loss, _ = step(p, opt_state, batch, jax.random.PRNGKey(1))
        print(f"[{impl}] compile+first step: {time.perf_counter()-t0:.0f}s "
              f"loss={float(loss):.3f}", flush=True)

        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            p, opt_state, loss, _ = step(
                p, opt_state, batch, jax.random.PRNGKey(2)
            )
            float(loss)
            best = min(best, time.perf_counter() - t0)
        print(f"[{impl}] train step: {best:.2f} s  "
              f"(full-res 480x640, {STEPS}-step unroll)", flush=True)


if __name__ == "__main__":
    main()
