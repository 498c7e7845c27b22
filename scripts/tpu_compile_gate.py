"""AOT compile gate: every Pallas-bearing production path, REAL TPU backend.

Round-2 postmortem (VERDICT r02): a Mosaic lowering failure ("Rotate with
non-32-bit data") shipped because the whole test suite runs in interpret
mode / on CPU — nothing exercised the actual TPU compiler. This gate
AOT-compiles (``jax.jit(fn).lower(*args).compile()`` — no execution, no
timing, so it works even when the shared chip is loaded) the paths a bench
or training run will hit:

  entry     __graft_entry__.entry() — flagship MultiScale vo_frame
  bench     vo_frame + chunked step at the exact bench shapes (480x640, 96
            patches, default CORR_LAYOUT)
  layouts   vo_frame at bench shapes with every hardware-safe corr layout
            (fused2/3/4) — keeps the A/B matrix compilable
  encoders  vo_frame with PALLAS_ENCODER=True, both families
  train     value_and_grad of TrainForward with the fused training corr
            (corr_sched_fused forward + corr_sched_bwd backward)

Run before every kernel-touching commit:  python scripts/tpu_compile_gate.py
Subset:  python scripts/tpu_compile_gate.py entry train
"""

import sys
import time
import traceback

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def _gate(name, fn, *args, **kwargs):
    t0 = time.perf_counter()
    jitted = fn if hasattr(fn, "lower") else None
    assert jitted is not None, f"{name}: fn must be jit-wrapped"
    jitted.lower(*args, **kwargs).compile()
    print(f"PASS {name}  ({time.perf_counter() - t0:.1f}s)")


def _make_vo(cfg, input_mode, H, W):
    import jax
    import jax.numpy as jnp

    from rampvo_tpu.models import VONet
    from rampvo_tpu.vo.runtime import make_enc_state
    from rampvo_tpu.vo.state import init_state

    vonet = VONet(input_mode=input_mode)
    params = vonet.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, H, W, 5)),
        jnp.zeros((1, H, W, 3)),
        jnp.asarray([True]),
    )
    # encoder-state layout must match the encode path (RampVO.__init__)
    state = init_state(cfg, make_enc_state(cfg, input_mode, H, W), H, W)
    rng = np.random.RandomState(0)
    ev = jnp.asarray(rng.rand(1, H, W, 5), jnp.float32)
    im = jnp.asarray(rng.rand(1, H, W, 3), jnp.float32)
    mask = jnp.asarray([True])
    intr = jnp.asarray([W / 2.0, W / 2.0, W / 2, H / 2], jnp.float32)
    return vonet, params, state, ev, im, mask, intr


def gate_entry():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    _gate("entry (MultiScale vo_frame, fused corr)", fn, *args)


def gate_bench():
    import jax.numpy as jnp

    from rampvo_tpu.vo import VOConfig
    from rampvo_tpu.vo.runtime import make_vo_frame, make_vo_frames_chunk

    H, W, K = 480, 640, 8
    cfg = VOConfig(BUFFER_SIZE=512, MAX_FRAMES=512, PATCHES_PER_FRAME=96,
                   MIXED_PRECISION=True, PROBE_THRESH=-1.0,
                   KEYFRAME_THRESH=0.0)
    vonet, params, state, ev, im, mask, intr = _make_vo(cfg, "MultiScale",
                                                        H, W)
    _gate("bench vo_frame 480x640 M=96 fused",
          make_vo_frame(cfg, vonet), params, state, ev, im, mask, intr)
    ev_k = jnp.broadcast_to(ev, (K,) + ev.shape)
    im_k = jnp.broadcast_to(im, (K,) + im.shape)
    masks = jnp.ones((K, 1), bool)
    _gate("bench chunk step K=8",
          make_vo_frames_chunk(cfg, vonet),
          params, state, ev_k, im_k, masks, intr)


def gate_layouts():
    from rampvo_tpu.vo import VOConfig
    from rampvo_tpu.vo.runtime import make_vo_frame

    H, W = 480, 640
    # only the hardware-safe layouts (static-amount rolls); folded is
    # CPU/interpret-only — its dynamic rolls miscompile on real TPUs
    for layout in ("fused2", "fused3", "fused4"):
        cfg = VOConfig(BUFFER_SIZE=512, MAX_FRAMES=512,
                       PATCHES_PER_FRAME=96, MIXED_PRECISION=True,
                       PROBE_THRESH=-1.0, KEYFRAME_THRESH=0.0,
                       CORR_LAYOUT=layout)
        vonet, params, state, ev, im, mask, intr = _make_vo(
            cfg, "MultiScale", H, W)
        _gate(f"vo_frame 480x640 CORR_LAYOUT={layout}",
              make_vo_frame(cfg, vonet), params, state, ev, im, mask, intr)


def gate_encoders():
    from rampvo_tpu.vo import VOConfig
    from rampvo_tpu.vo.runtime import make_vo_frame

    H, W = 240, 320
    for mode in ("MultiScale", "SingleScale"):
        cfg = VOConfig(BUFFER_SIZE=256, MAX_FRAMES=256,
                       PATCHES_PER_FRAME=32, REMOVAL_WINDOW=10,
                       OPTIMIZATION_WINDOW=6, PATCH_LIFETIME=6,
                       MIXED_PRECISION=True, PALLAS_ENCODER=True)
        vonet, params, state, ev, im, mask, intr = _make_vo(cfg, mode, H, W)
        _gate(f"vo_frame PALLAS_ENCODER {mode}",
              make_vo_frame(cfg, vonet), params, state, ev, im, mask, intr)


def gate_train():
    import jax
    import jax.numpy as jnp

    from rampvo_tpu.lie import ops as lops
    from rampvo_tpu.models import VONet
    from rampvo_tpu.train import TrainForward

    H, W, NF, M, STEPS = 48, 64, 10, 4, 9
    vonet = VONet(input_mode="MultiScale")
    params = vonet.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, H, W, 5)),
        jnp.zeros((1, H, W, 3)),
        jnp.asarray([True]),
    )
    fwd = TrainForward(vonet, n_frames=NF, M=M, steps=STEPS)
    rng = np.random.RandomState(0)
    events = jnp.asarray(rng.rand(NF, H, W, 5), jnp.float32)
    images = jnp.asarray(rng.rand(NF, H, W, 3), jnp.float32)
    poses = jnp.asarray(
        np.asarray(
            lops.se3_exp(jnp.asarray(0.05 * rng.randn(NF, 6), jnp.float32))
        )
    )
    disps = jnp.asarray(0.5 + 0.1 * rng.rand(NF, H, W), jnp.float32)
    intr = jnp.broadcast_to(jnp.asarray([40.0, 40.0, W / 2, H / 2]), (NF, 4))
    mask = jnp.ones((NF,), bool)

    def loss_fn(p, key):
        loss, _ = fwd(p, events, images, poses, disps, intr, mask, key)
        return loss

    grad = jax.jit(jax.value_and_grad(loss_fn))
    _gate("train value_and_grad (fused corr fwd+bwd)",
          grad, params, jax.random.PRNGKey(1))


GATES = {
    "entry": gate_entry,
    "bench": gate_bench,
    "layouts": gate_layouts,
    "encoders": gate_encoders,
    "train": gate_train,
}


def main():
    names = sys.argv[1:] or list(GATES)
    unknown = [n for n in names if n not in GATES]
    assert not unknown, f"unknown gates {unknown}; have {list(GATES)}"

    import jax

    # retry transient axon-backend init flakes (same policy as bench.py)
    for attempt in range(5):
        try:
            dev = jax.devices()
            break
        except RuntimeError as e:
            if attempt == 4:
                raise
            print(f"backend init failed ({e}); retry {attempt + 1}/4",
                  file=sys.stderr)
            time.sleep(60)
    assert dev[0].platform != "cpu", (
        "compile gate must target the real TPU backend; got CPU")
    print(f"backend: {dev}")

    failed = []
    for n in names:
        try:
            GATES[n]()
        except Exception:
            traceback.print_exc()
            print(f"FAIL {n}")
            failed.append(n)
    if failed:
        print(f"compile gate FAILED: {failed}")
        sys.exit(1)
    print("compile gate: all green")


if __name__ == "__main__":
    main()
