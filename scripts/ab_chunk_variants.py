"""In-process A/B of the PRODUCTION chunked frame step (chunk=8, bench
shapes) across config variants (corr layout etc.). Warmup AND timing both
run through the chunk jit (one compile per variant). Cross-process numbers
swing +-40% on the shared chip; only the in-process deltas are signal.

r04 measured here: fused3 -3.1 ms/frame vs fused2 (24.85 vs 27.99);
batched chunk heads +0.3 (on fused2) / +0.4 (on fused3) ms/frame — dead
end, removed from the runtime.

Run alone: python scripts/ab_chunk_variants.py [variant ...]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from rampvo_tpu.models import VONet
from rampvo_tpu.vo import VOConfig
from rampvo_tpu.vo.runtime import make_enc_state, make_vo_frames_chunk
from rampvo_tpu.vo.state import init_state

H, W = 480, 640
K = 8

BASE = dict(
    BUFFER_SIZE=512, MAX_FRAMES=512, MIXED_PRECISION=True,
    PROBE_THRESH=-1.0, KEYFRAME_THRESH=0.0,
)

ALL_VARIANTS = {
    "f2": {"CORR_LAYOUT": "fused2"},
    "f3": {"CORR_LAYOUT": "fused3"},
    "f4": {"CORR_LAYOUT": "fused4"},
    # control: the pre-r05 f32 encoder carry (per-frame f32<->bf16 casts)
    "f3_f32carry": {"CORR_LAYOUT": "fused3", "_f32_carry": True},
}
# argv selects variants (first = baseline); default the r04 decision pair
VARIANTS = [
    (n, ALL_VARIANTS[n])
    for n in (sys.argv[1:] or ["f2", "f3"])
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
    masks = jnp.ones((K, 1), bool)
    chunks = [
        (jnp.asarray(rng.rand(K, 1, H, W, 5), jnp.float32),
         jnp.asarray(rng.rand(K, 1, H, W, 3), jnp.float32))
        for _ in range(11)
    ]

    results = {}
    for name, kw in VARIANTS:
        kw = dict(kw)
        f32_carry = kw.pop("_f32_carry", False)
        cfg = VOConfig(**{**BASE, **kw})
        chunk = make_vo_frames_chunk(cfg, vonet)
        enc0 = make_enc_state(cfg, "MultiScale", H, W)
        if f32_carry:
            enc0 = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.float32), enc0)
        state = init_state(cfg, enc0, H, W)
        t0 = time.perf_counter()
        for ev_k, im_k in chunks[:5]:
            state = chunk(params, state, ev_k, im_k, masks, intr)
        float(jnp.sum(state.poses[:8]))
        print(f"{name:14s} warm {time.perf_counter()-t0:5.1f}s", flush=True)

        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for ev_k, im_k in chunks[5:]:
                state = chunk(params, state, ev_k, im_k, masks, intr)
            float(jnp.sum(state.poses[:8]))
            best = min(best, (time.perf_counter() - t0) / (6 * K))
        results[name] = best * 1e3
        print(f"{name:14s} {best*1e3:6.2f} ms/frame", flush=True)

    print("\nsummary:")
    base = results[VARIANTS[0][0]]
    for name, ms in results.items():
        print(f"  {name:14s} {ms:6.2f} ms  ({ms - base:+5.2f})")


if __name__ == "__main__":
    main()
