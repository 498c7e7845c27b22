"""Benchmark: steady-state VO frame rate of the flagship MultiScale model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the driver north-star of 120 FPS MultiScale inference per chip
(BASELINE.md / BASELINE.json "north_star").
"""

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--chunk", type=int, default=8,
                    help="frames per dispatch (lax.scan inside one jit; "
                    "amortizes the ~3 ms remote-dispatch floor at `chunk` "
                    "frames of latency; 1 = per-frame streaming)")
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--patches", type=int, default=96)
    ap.add_argument("--input_mode", type=str, default="MultiScale",
                    choices=["MultiScale", "SingleScale"])
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    # the shared-TPU axon backend occasionally fails to initialize
    # (UNAVAILABLE); retry a few times before giving up so a transient
    # flake doesn't void the benchmark run
    for attempt in range(5):
        try:
            jax.devices()
            break
        except RuntimeError as e:
            if attempt == 4:
                raise
            print(f"backend init failed ({e}); retry {attempt + 1}/4",
                  file=sys.stderr)
            time.sleep(60)
    import jax.numpy as jnp
    import numpy as np

    from rampvo_tpu.models import VONet
    from rampvo_tpu.vo import VOConfig
    from rampvo_tpu.vo.runtime import make_enc_state, make_vo_frame
    from rampvo_tpu.vo.state import init_state

    H, W = args.height, args.width
    cfg = VOConfig(
        BUFFER_SIZE=512,
        MAX_FRAMES=512,
        PATCHES_PER_FRAME=args.patches,
        MIXED_PRECISION=True,
        PROBE_THRESH=-1.0,  # synthetic frames carry no real motion signal;
        # force the full update+keyframe path so we measure the real workload
        KEYFRAME_THRESH=0.0,  # random-net motionmag ~ 0 would evict a frame
        # every step, pinning n ~ 8 and leaving the edge lattice ~4x empty —
        # flattering corr/BA. Never-evict measures the FULL steady-state
        # windows a real tracking run sustains (round-1 bench measured the
        # half-empty state; see VERDICT r01 weak #7).
    )
    vonet = VONet(input_mode=args.input_mode)
    params = vonet.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, H, W, 5)),
        jnp.zeros((1, H, W, 3)),
        jnp.asarray([True]),
    )
    state = init_state(
        cfg, make_enc_state(cfg, args.input_mode, H, W), H, W)
    K = max(args.chunk, 1)
    if K > 1:
        from rampvo_tpu.vo.runtime import make_vo_frames_chunk

        vo_chunk = make_vo_frames_chunk(cfg, vonet)
    vo_frame = make_vo_frame(cfg, vonet)

    rng = np.random.RandomState(0)
    intr = jnp.asarray([320.0, 320.0, W / 2, H / 2], jnp.float32)
    mask = jnp.asarray([True])

    def frame(i):
        ev = jnp.asarray(rng.rand(1, H, W, 5), jnp.float32)
        im = jnp.asarray(rng.rand(1, H, W, 3), jnp.float32)
        return ev, im

    # warmup: compile + initialize the SLAM, then fill the edge lattice to
    # steady state (full windows need n >= NI + PATCH_LIFETIME frames)
    n_warm = 40
    for i in range(n_warm):
        ev, im = frame(i)
        state = vo_frame(params, state, ev, im, mask, intr)
    float(jnp.sum(state.poses[:8]))  # force full device completion

    # steady state timing (ends with a genuine value fetch: on remote-TPU
    # backends block_until_ready alone does not fence execution). Two passes,
    # best taken: the TPU terminal is shared and single passes are noisy.
    n_frames = args.frames - args.frames % K
    frames = [frame(n_warm + i) for i in range(n_frames)]
    if K > 1:
        chunks = [
            (
                jnp.stack([e for e, _ in frames[i:i + K]]),
                jnp.stack([m for _, m in frames[i:i + K]]),
            )
            for i in range(0, n_frames, K)
        ]
        masks = jnp.ones((K, 1), bool)
        # compile the chunk step
        state = vo_chunk(params, state, *chunks[0], masks, intr)
        float(jnp.sum(state.poses[:8]))
    dt = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        if K > 1:
            for ev_k, im_k in chunks:
                state = vo_chunk(params, state, ev_k, im_k, masks, intr)
        else:
            for ev, im in frames:
                state = vo_frame(params, state, ev, im, mask, intr)
        float(jnp.sum(state.poses[:8]))
        dt = min(dt, time.perf_counter() - t0)

    fps = n_frames / dt
    print(
        json.dumps(
            {
                "metric": ("vo_fps_multiscale_480x640"
                           if args.input_mode == "MultiScale"
                           else "vo_fps_singlescale_480x640"),
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 120.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
