"""A/B full-frame time across VOConfig implementation toggles, ONE process
(the shared TPU swings +-40% between processes; in-process ratios hold).

Bisects which of {fused encoder, paired corr layout, cell reprojection,
cell BA linearization} helps/hurts the steady-state frame time.

Run alone: PYTHONPATH=.:/root/.axon_site python scripts/ab_frame_variants.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from rampvo_tpu.models import VONet
from rampvo_tpu.vo import VOConfig
from rampvo_tpu.vo.runtime import make_enc_state, make_vo_frame
from rampvo_tpu.vo.state import init_state

H, W = 480, 640

BASE = dict(
    BUFFER_SIZE=512, MAX_FRAMES=512, MIXED_PRECISION=True,
    PROBE_THRESH=-1.0, KEYFRAME_THRESH=0.0,
    # pin OFF in the base so each variant toggles exactly one thing
    # (the config default is "auto" = on-chip True)
    PALLAS_ENCODER=False,
)

VARIANTS = [
    # paired/folded layouts are CPU/interpret-only (dynamic-amount rolls
    # silently miscompile on real TPUs — scripts/check_layouts_onchip.py);
    # timing garbage output is meaningless, so only hardware-safe variants
    ("all-new", {}),
    ("enc=pallas", {"PALLAS_ENCODER": True}),
    ("cell_repr=off", {"CELL_REPROJECT": False}),
    ("cell_lin=off", {"CELL_LINEARIZE": False}),
]


def main():
    vonet = VONet(input_mode="MultiScale")
    params = vonet.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, H, W, 5)), jnp.zeros((1, H, W, 3)),
        jnp.asarray([True]),
    )
    rng = np.random.RandomState(0)
    intr = jnp.asarray([320.0, 320.0, W / 2, H / 2], jnp.float32)
    mask = jnp.asarray([True])
    frames = [
        (jnp.asarray(rng.rand(1, H, W, 5), jnp.float32),
         jnp.asarray(rng.rand(1, H, W, 3), jnp.float32))
        for _ in range(56)
    ]

    results = {}
    for name, kw in VARIANTS:
        cfg = VOConfig(**{**BASE, **kw})
        vo_frame = make_vo_frame(cfg, vonet)
        state = init_state(
            cfg, make_enc_state(cfg, "MultiScale", H, W), H, W)
        t0 = time.perf_counter()
        for ev, im in frames[:40]:
            state = vo_frame(params, state, ev, im, mask, intr)
        float(jnp.sum(state.poses[:8]))
        print(f"{name:12s} warm {time.perf_counter()-t0:5.1f}s", flush=True)

        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for ev, im in frames[40:]:
                state = vo_frame(params, state, ev, im, mask, intr)
            float(jnp.sum(state.poses[:8]))
            best = min(best, (time.perf_counter() - t0) / 16)
        results[name] = best * 1e3
        print(f"{name:12s} {best*1e3:6.2f} ms/frame", flush=True)

    print("\nsummary:")
    base = results["all-new"]
    for name, ms in results.items():
        print(f"  {name:12s} {ms:6.2f} ms  ({ms - base:+5.2f} vs all-new)")


if __name__ == "__main__":
    main()
